"""TensorFileWriter-compatible binary tensor records (M14/S12 byte
layout; reference ``util/.../io/TensorFileWriter.java`` writeTensorSet /
byteArrayTensorSet with ``TensorFileReader.oldStyleString = false``):

* int32 BE tensor count
* per tensor: 1 type byte (0=double, 1=float, 2=int, 3=string),
  int32 BE ndims, int32 BE per dim, then the flat row-major values —
  float64 / float32 / int32 big-endian; strings as int32 BE utf-8 byte
  length + bytes + a 0x00 terminator (``DataIO.writeUTFSimpler``)
* one trailing 0x00 canary byte

Scalars are rank-0 (ndims = 0). The Spark seam base64-encodes one
record per line exactly like ``RelexTensorDataset.java:81``.
"""

from __future__ import annotations

import struct

import numpy as np

_T_DOUBLE, _T_FLOAT, _T_INT, _T_STRING = 0, 1, 2, 3

_DTYPES = {
    _T_DOUBLE: ">f8",
    _T_FLOAT: ">f4",
    _T_INT: ">i4",
}


def _type_of(t) -> int:
    if isinstance(t, str):
        return _T_STRING
    if isinstance(t, int):
        return _T_INT
    if isinstance(t, float):
        return _T_DOUBLE
    a = np.asarray(t)
    if a.dtype.kind == "U" or a.dtype == object:
        return _T_STRING
    if a.dtype == np.float32:
        return _T_FLOAT
    if a.dtype.kind == "f":
        return _T_DOUBLE
    if a.dtype.kind in "iu":
        return _T_INT
    raise ValueError(f"unsupported tensor dtype: {a.dtype}")


def _write_utf(out: bytearray, s: str) -> None:
    raw = s.encode("utf-8")
    out += struct.pack(">i", len(raw))
    out += raw
    out.append(0)


def write_tensor_set(*tensors) -> bytes:
    """Serialize one tensor set exactly as
    ``TensorFileWriter.byteArrayTensorSet`` does (bit-for-bit; verified
    against a JVM golden built from the reference class in pytest)."""
    out = bytearray(struct.pack(">i", len(tensors)))
    for t in tensors:
        tid = _type_of(t)
        out.append(tid)
        if isinstance(t, (str, int, float)):
            out += struct.pack(">i", 0)  # rank-0
            if tid == _T_STRING:
                _write_utf(out, t)
            else:
                out += np.asarray(t, dtype=_DTYPES[tid]).tobytes()
            continue
        a = np.asarray(t)
        out += struct.pack(">i", a.ndim)
        for d in a.shape:
            out += struct.pack(">i", d)
        if tid == _T_STRING:
            for s in a.ravel():
                _write_utf(out, str(s))
        else:
            if tid == _T_INT and a.size and np.issubdtype(a.dtype, np.integer):
                # astype('>i4') silently WRAPS out-of-range int64/uint
                # values (2**31 -> -2147483648), corrupting the record;
                # the scalar path already raises OverflowError — make
                # the array path equally loud
                mn, mx = int(a.min()), int(a.max())
                if mn < -(2**31) or mx > 2**31 - 1:
                    raise OverflowError(
                        f"int tensor value out of int32 range [{mn}, {mx}]"
                    )
            out += np.ascontiguousarray(a).astype(_DTYPES[tid]).tobytes()
    out.append(0)  # canary
    return bytes(out)


def read_tensor_set(data: bytes):
    """Decode one tensor set; returns a list of numpy arrays / scalars.
    Raises on a bad canary or trailing garbage."""
    off = 0

    def _i4() -> int:
        nonlocal off
        v = struct.unpack_from(">i", data, off)[0]
        off += 4
        return v

    n = _i4()
    out = []
    for _ in range(n):
        tid = data[off]
        off += 1
        ndims = _i4()
        shape = tuple(_i4() for _ in range(ndims))
        count = int(np.prod(shape)) if shape else 1
        if tid == _T_STRING:
            vals = []
            for _ in range(count):
                ln = _i4()
                vals.append(data[off : off + ln].decode("utf-8"))
                off += ln
                if data[off] != 0:
                    raise ValueError("missing string terminator")
                off += 1
            out.append(
                vals[0] if ndims == 0 else np.array(vals).reshape(shape)
            )
        else:
            dt = np.dtype(_DTYPES[tid])
            arr = np.frombuffer(data, dtype=dt, count=count, offset=off)
            off += count * dt.itemsize
            if ndims == 0:
                out.append(arr[0].item())
            else:
                out.append(arr.reshape(shape).astype(dt.newbyteorder("=")))
    if data[off] != 0:
        raise ValueError("bad canary byte")
    if off + 1 != len(data):
        raise ValueError("trailing bytes after canary")
    return out


def relex_record_bytes(
    group_id: str,
    words,
    pos1,
    pos2,
    pool_starts,
    pool_ends,
    sent_starts,
    gt_rels,
    type_tensor=(0, 0),
) -> bytes:
    """One RelexTensors training record in the reference's tensor order
    (``RelexTensors.java:189-191``): groupId string, int[3][sumWords]
    word/pos1/pos2 index matrix, int[n][2] pool pieces, int[n] sentence
    starts, the type tensor (int[2] for TypeStyle.none), int[] gtRels."""
    wim = np.stack(
        [np.asarray(words), np.asarray(pos1), np.asarray(pos2)]
    ).astype(np.int32)
    pool = np.stack(
        [np.asarray(pool_starts), np.asarray(pool_ends)], axis=1
    ).astype(np.int32)
    return write_tensor_set(
        group_id,
        wim,
        pool,
        np.asarray(sent_starts, np.int32),
        np.asarray(type_tensor, np.int32),
        np.asarray(gt_rels, np.int32),
    )
