"""Self-contained NIfTI-1 reader/writer (no nibabel/SimpleITK dependency).

The runtime image ships without nibabel, so we implement the small subset of
NIfTI-1 the framework needs (reference DataLoader/Liver/nii_kits.py:21-66 uses
nibabel for the same subset): single-file .nii / .nii.gz, the common dtypes,
scl_slope/scl_inter scaling, pixdim spacing, and the LiTS orientation quirk
(`special` flips the y axis — livers in volumes 28-47 / labels 28-52 are
anatomically flipped, reference extract.py:190-196).

Data layout convention: arrays are returned as [depth, height, width] (z, y, x),
matching the reference's `read_nii(..).transpose` usage.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64, 1280: np.uint64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


class NiiHeader:
    """Minimal header info mirroring the nibabel API surface the reference uses
    (get_data_shape / get_zooms, reference extract.py:165-167)."""

    def __init__(self, shape: Tuple[int, ...], zooms: Tuple[float, ...],
                 dtype: np.dtype, affine: Optional[np.ndarray] = None):
        self.shape = tuple(int(s) for s in shape)
        self.zooms = tuple(float(z) for z in zooms)
        self.dtype = np.dtype(dtype)
        self.affine = affine if affine is not None else np.diag(
            list(self.zooms[:3]) + [1.0]).astype(np.float64)

    def get_data_shape(self):
        return self.shape

    def get_zooms(self):
        return self.zooms


def _open(path: Path, mode: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_nii(path, out_dtype=None, special: bool = False, only_header: bool = False):
    """Read a NIfTI-1 file → (NiiHeader, volume[z, y, x]).

    special=True flips the y (height) axis, replicating the reference's
    handling of mis-oriented LiTS cases (nii_kits.py:21-43).
    """
    path = Path(path)
    with _open(path, "rb") as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            endian = ">"
            if struct.unpack(">i", hdr[0:4])[0] != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
        dim = struct.unpack(endian + "8h", hdr[40:56])
        datatype = struct.unpack(endian + "h", hdr[70:72])[0]
        pixdim = struct.unpack(endian + "8f", hdr[76:108])
        vox_offset = struct.unpack(endian + "f", hdr[108:112])[0]
        scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
        scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
        magic = hdr[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
        ndim = dim[0]
        shape = dim[1:1 + ndim]          # (x, y, z, ...)
        zooms = pixdim[1:1 + ndim]
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
        header = NiiHeader(shape, zooms, dtype)
        if only_header:
            return header, None

        f.seek(int(vox_offset))
        count = int(np.prod(shape))
        raw = f.read(count * dtype.itemsize)
        data = np.frombuffer(raw, dtype=dtype, count=count)
    # NIfTI is Fortran-ordered (x fastest) → reshape reversed dims gives [z, y, x]
    vol = data.reshape(shape[::-1])
    if scl_slope not in (0.0, 1.0) or scl_inter not in (0.0,) and not np.isnan(scl_inter):
        if scl_slope == 0.0:
            scl_slope = 1.0
        vol = vol.astype(np.float32) * scl_slope + (0.0 if np.isnan(scl_inter) else scl_inter)
    if special:
        vol = np.flip(vol, axis=1)
    if out_dtype is not None:
        vol = vol.astype(out_dtype)
    else:
        vol = np.asarray(vol)
    return header, np.ascontiguousarray(vol)


def write_nii(data: np.ndarray, path, zooms=(1.0, 1.0, 1.0), special: bool = False,
              out_dtype=None):
    """Write volume[z, y, x] as a NIfTI-1 single file (.nii or .nii.gz).

    zooms are (z, y, x) spacings (the reference passes header zooms through,
    nii_kits.py:46-66).
    """
    path = Path(path)
    if special:
        data = np.flip(data, axis=1)
    if out_dtype is not None:
        data = data.astype(out_dtype)
    data = np.ascontiguousarray(data)
    if data.dtype not in _CODES:
        data = data.astype(np.float32)
    datatype = _CODES[np.dtype(data.dtype)]
    ndim = data.ndim
    dim = [ndim] + list(data.shape[::-1]) + [1] * (7 - ndim)
    pd = [1.0] + list(zooms[::-1]) + [1.0] * (7 - len(zooms))

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, datatype)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, *pd)
    struct.pack_into("<f", hdr, 108, 352.0)   # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)     # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)     # scl_inter
    # sform: simple diagonal spacing affine (qform left 0)
    struct.pack_into("<h", hdr, 254, 1)       # sform_code = SCANNER_ANAT
    sx, sy, sz = pd[1], pd[2], pd[3]
    struct.pack_into("<4f", hdr, 280, sx, 0, 0, 0)
    struct.pack_into("<4f", hdr, 296, 0, sy, 0, 0)
    struct.pack_into("<4f", hdr, 312, 0, 0, sz, 0)
    hdr[344:348] = b"n+1\x00"

    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)  # extension flag
        f.write(data.tobytes(order="C"))


def read_lits(pid_or_path, kind: str = "vol", root=None):
    """LiTS convenience reader with the orientation quirk applied
    (reference nii_kits.py:51-66, extract.py:70-75): volumes 28-47 and labels
    28-51 are y-flipped."""
    path = Path(pid_or_path)
    pid = int(path.stem.split(".")[0].split("-")[-1])
    if kind == "vol":
        special = 28 <= pid < 48
    else:
        special = 28 <= pid < 52
    return read_nii(path, special=special)
