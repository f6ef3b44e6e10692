"""Device-side (jit-able) and host-side kernel utilities.

- image_ops:  jit-able augmentation / normalization primitives (keyed PRNG)
- guides:     Gaussian / Euclidean spatial-guide rendering (2D & 3D)
- losses:     weighted cross-entropy, generalized dice, pixel-weight schemes
- metrics:    in-graph train metrics (Dice/VOE/VD) + ConfusionMatrix accumulator
- metrics3d:  host-side 3D eval metrics (Dice/VOE/RVD/ASSD/RMSD/MSD)
- array_kits: host-side numpy utilities (moments, bboxes, components, guides)
"""
