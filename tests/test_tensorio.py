"""TensorFileWriter byte-layout twins (M14/S12): JVM goldens generated
from the REFERENCE TensorFileWriter class itself (see
tools/gen_tensor_golden.md), plus bit-exact round-trips."""

from __future__ import annotations

import base64

import numpy as np

from cc_dbp_spark.sources import tensorio as tio

# byteArrayTensorSet("ent:a\tent:b", int[3][5], int[2][2], int[2], int[2], int[1])
GOLDEN_RELEX = (
    "AAAABgMAAAAAAAAAC2VudDphCWVudDpiAAIAAAACAAAAAwAAAAUAAAAF/////wAAAAkAAAAC"
    "AAAABwAAAB4AAAAfAAAAIAAAAB8AAAAeAAAAHQAAAB4AAAAfAAAAIAAAAB8CAAAAAgAAAAIA"
    "AAACAAAAAQAAAAIAAAABAAAAAwIAAAABAAAAAgAAAAAAAAADAgAAAAEAAAACAAAAAAAAAAAC"
    "AAAAAQAAAAEAAAABAA=="
)
# byteArrayTensorSet(42, 2.5d, 1.5f, "héllo", double[2], float[2][2], String[2])
GOLDEN_MIXED = (
    "AAAABwIAAAAAAAAAKgAAAAAAQAQAAAAAAAABAAAAAD/AAAADAAAAAAAAAAZow6lsbG8AAAAA"
    "AAEAAAACP9AAAAAAAAC/8AAAAAAAAAEAAAACAAAAAgAAAAI/gAAAQAAAAEBAAABAgAAAAwAA"
    "AAEAAAACAAAAAmFiAAAAAAFjAAA="
)


def test_relex_record_matches_jvm_golden():
    rec = tio.relex_record_bytes(
        "ent:a\tent:b",
        words=[5, -1, 9, 2, 7],
        pos1=[30, 31, 32, 31, 30],
        pos2=[29, 30, 31, 32, 31],
        pool_starts=[1, 1],
        pool_ends=[2, 3],
        sent_starts=[0, 3],
        gt_rels=[1],
    )
    assert base64.b64encode(rec).decode() == GOLDEN_RELEX


def test_mixed_tensor_set_matches_jvm_golden():
    rec = tio.write_tensor_set(
        42, 2.5, np.float32(1.5), "héllo",
        np.array([0.25, -1.0]),
        np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32),
        np.array(["ab", "c"]),
    )
    assert base64.b64encode(rec).decode() == GOLDEN_MIXED


def test_round_trip_bit_exact():
    tensors = [
        "group\tid",
        np.arange(12, dtype=np.int32).reshape(3, 4),
        np.array([[0.5, -0.5]], dtype=np.float32),
        np.array([1.25, 2.5]),
        np.array(["x", "yz", ""]),
        7,
        -0.125,
    ]
    rec = tio.write_tensor_set(*tensors)
    back = tio.read_tensor_set(rec)
    assert len(back) == len(tensors)
    assert back[0] == tensors[0]
    assert (back[1] == tensors[1]).all() and back[1].dtype == np.int32
    assert (back[2] == tensors[2]).all() and back[2].dtype == np.float32
    assert (back[3] == tensors[3]).all()
    assert list(back[4]) == ["x", "yz", ""]
    assert back[5] == 7 and back[6] == -0.125
    # re-encode of the decode is byte-identical
    assert tio.write_tensor_set(*back) == rec


def test_decoder_rejects_corruption():
    import pytest

    rec = bytearray(tio.write_tensor_set(np.array([1, 2], dtype=np.int32)))
    rec[-1] = 1  # break the canary
    with pytest.raises(ValueError):
        tio.read_tensor_set(bytes(rec))
    with pytest.raises(ValueError):
        tio.read_tensor_set(tio.write_tensor_set(3) + b"\x00")
