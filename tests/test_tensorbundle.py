"""Native TF1 TensorBundle (.ckpt) reader vs an INDEPENDENT minimal writer.

The writer below builds the V2 checkpoint byte-for-byte from the format
specs (LevelDB table_format.md + tensorflow/core/util/tensor_bundle) with
its own protobuf encoder and its own bit-by-bit crc32c — sharing no code
with ``dis_yolo_tpu/train/tensorbundle.py`` — so agreement is evidence
about the format, not about one implementation (the test_darknet pattern).

It deliberately exercises the nastier corners: multi-block index tables,
prefix-compressed keys with small restart intervals, multiple data shards,
scalar tensors, and every weight dtype the reader maps.
"""

import struct

import jax
import numpy as np
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import checkpoint as ckpt
from dis_yolo_tpu.train import tensorbundle as tb


# ---------------------------------------------------------------------------
# independent writer
# ---------------------------------------------------------------------------

def _crc32c_ref(data: bytes) -> int:
    """Bit-serial crc32c (Castagnoli), no table — independent of the
    reader's table-driven version."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _vint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_varint(field: int, value: int) -> bytes:
    return _vint(field << 3) + _vint(value)


def _pb_bytes(field: int, value: bytes) -> bytes:
    return _vint(field << 3 | 2) + _vint(len(value)) + value


def _pb_fixed32(field: int, value: int) -> bytes:
    return _vint(field << 3 | 5) + struct.pack("<I", value)


_DT_OF = {np.dtype("float32"): 1, np.dtype("float64"): 2,
          np.dtype("int32"): 3, np.dtype("uint8"): 4, np.dtype("int16"): 5,
          np.dtype("int8"): 6, np.dtype("int64"): 9, np.dtype("bool"): 10,
          np.dtype("uint16"): 17, np.dtype("float16"): 19,
          np.dtype("uint32"): 22, np.dtype("uint64"): 23}


def _entry_proto(arr: np.ndarray, shard: int, offset: int,
                 with_crc: bool = True) -> bytes:
    shape = b"".join(
        _pb_bytes(2, _pb_varint(1, d)) for d in arr.shape)
    raw = arr.tobytes()
    msg = (_pb_varint(1, _DT_OF[arr.dtype]) + _pb_bytes(2, shape)
           + _pb_varint(3, shard) + _pb_varint(4, offset)
           + _pb_varint(5, len(raw)))
    if with_crc:
        msg += _pb_fixed32(6, _mask(_crc32c_ref(raw)))
    return msg


def _block(items, restart_interval=2) -> bytes:
    """Prefix-compressed table block with restart points."""
    out, restarts, prev = b"", [], b""
    for i, (key, val) in enumerate(items):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            while (shared < len(prev) and shared < len(key)
                   and prev[shared] == key[shared]):
                shared += 1
        out += (_vint(shared) + _vint(len(key) - shared) + _vint(len(val))
                + key[shared:] + val)
        prev = key
    if not restarts:
        restarts = [0]
    for r in restarts:
        out += struct.pack("<I", r)
    return out + struct.pack("<I", len(restarts))


def write_bundle(prefix: str, tensors, num_shards=1, entries_per_block=3,
                 entry_crc=True):
    """tensors: list of (name, array, shard_id). Writes .index + .data."""
    shard_bytes = {i: b"" for i in range(num_shards)}
    recs = []
    for name, arr, shard in tensors:
        off = len(shard_bytes[shard])
        shard_bytes[shard] += arr.tobytes()
        recs.append((name.encode(), _entry_proto(arr, shard, off, entry_crc)))
    header = _pb_varint(1, num_shards)      # BundleHeaderProto, little-endian
    items = [(b"", header)] + sorted(recs)

    file_bytes = b""
    index_entries = []
    for i in range(0, len(items), entries_per_block):
        blk = _block(items[i:i + entries_per_block])
        handle = _vint(len(file_bytes)) + _vint(len(blk))
        file_bytes += blk + b"\x00" + struct.pack(
            "<I", _mask(_crc32c_ref(blk + b"\x00")))
        # separator key: the block's own last key is always a valid >= bound
        index_entries.append((items[min(i + entries_per_block, len(items))
                                    - 1][0], handle))
    meta = _block([])                       # empty metaindex block
    meta_handle = _vint(len(file_bytes)) + _vint(len(meta))
    file_bytes += meta + b"\x00" + struct.pack(
        "<I", _mask(_crc32c_ref(meta + b"\x00")))
    index = _block(index_entries)
    index_handle = _vint(len(file_bytes)) + _vint(len(index))
    file_bytes += index + b"\x00" + struct.pack(
        "<I", _mask(_crc32c_ref(index + b"\x00")))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    with open(prefix + ".index", "wb") as f:
        f.write(file_bytes + footer)
    for i in range(num_shards):
        with open(f"{prefix}.data-{i:05d}-of-{num_shards:05d}", "wb") as f:
            f.write(shard_bytes[i])


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_roundtrip_all_dtypes(tmp_path, rng):
    tensors = [
        ("a/float", rng.rand(3, 4).astype(np.float32), 0),
        ("a/double", rng.rand(2, 2, 2), 0),
        ("b/int32", rng.randint(-5, 5, (7,)).astype(np.int32), 0),
        ("b/int64", rng.randint(0, 9, (2, 3)).astype(np.int64), 0),
        ("c/bool", rng.rand(5) > 0.5, 0),
        ("c/half", rng.rand(4).astype(np.float16), 0),
        ("c/scalar", np.float32(3.25).reshape(()), 0),
    ]
    prefix = str(tmp_path / "model.ckpt")
    write_bundle(prefix, tensors)
    got = tb.read_tensor_bundle(prefix, verify_tensors=True)
    assert set(got) == {n for n, _, _ in tensors}
    for name, arr, _ in tensors:
        assert got[name].dtype == arr.dtype
        np.testing.assert_array_equal(got[name], arr)


@pytest.mark.quick
def test_multiblock_prefix_compressed_index(tmp_path, rng):
    """Many shared-prefix keys over several index blocks + 2 data shards —
    the layout a real 85-layer TF1 checkpoint has, scaled down."""
    tensors = []
    for i in range(1, 26):
        tensors.append((f"yolo/convolutional{i}/weights",
                        rng.rand(3, 3, 2, 2).astype(np.float32), i % 2))
        tensors.append((f"yolo/convolutional{i}/BatchNorm/beta",
                        rng.rand(2).astype(np.float32), i % 2))
    prefix = str(tmp_path / "big.ckpt")
    write_bundle(prefix, tensors, num_shards=2, entries_per_block=4)
    got = tb.read_tensor_bundle(prefix)
    assert len(got) == 50
    for name, arr, _ in tensors:
        np.testing.assert_array_equal(got[name], arr)


@pytest.mark.quick
def test_corruption_detected(tmp_path, rng):
    prefix = str(tmp_path / "c.ckpt")
    write_bundle(prefix, [("w", rng.rand(8, 8).astype(np.float32), 0)])
    # flip one tensor byte: entry crc must catch it
    with open(prefix + ".data-00000-of-00001", "r+b") as f:
        f.seek(11)
        b = f.read(1)
        f.seek(11)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="crc32c mismatch"):
        tb.read_tensor_bundle(prefix, verify_tensors=True)
    # flip one index byte: block crc must catch it
    with open(prefix + ".index", "r+b") as f:
        f.seek(3)
        b = f.read(1)
        f.seek(3)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="crc|varint|magic|range"):
        tb.read_tensor_bundle(prefix)


@pytest.mark.quick
def test_clear_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="PREFIX"):
        tb.read_tensor_bundle(str(tmp_path / "missing.ckpt"))
    bad = str(tmp_path / "v1.ckpt")
    with open(bad + ".index", "wb") as f:
        f.write(b"\x00" * 64)               # wrong magic
    with pytest.raises(ValueError, match="magic"):
        tb.read_tensor_bundle(bad)


@pytest.mark.quick
def test_crc32c_cross_check(rng):
    """Reader's table-driven crc32c == writer's bit-serial one, and both
    match the published crc32c test vector."""
    # RFC 3720 / crc32c reference vector
    assert tb.crc32c(b"123456789") == 0xE3069283
    for n in (0, 1, 7, 100):
        data = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        assert tb.crc32c(data) == _crc32c_ref(data)


def test_stage1_restore_from_native_bundle(tmp_path, small_cfg, rng):
    """The full workflow of train_yolo3_mask.py:104-107 with NO TensorFlow:
    a TF1-named .ckpt -> convert_tf1_checkpoint (native reader) ->
    stage1_restore.  Backbone+head layers land, mask subnet keeps init."""
    v = api.init_variables(small_cfg, jax.random.PRNGKey(0))
    # synthesize a checkpoint carrying the reference's variable names
    ref = ckpt.export_tf1_weights(v)
    tensors = [(name, rng.rand(*arr.shape).astype(np.float32), 0)
               for name, arr in sorted(ref.items())
               # stage-1 source has no mask-subnet layers (76-82)
               if not any(f"convolutional{i}/" in name
                          for i in range(76, 86))]
    prefix = str(tmp_path / "yolov3_3class_coco.ckpt")
    write_bundle(prefix, tensors, entries_per_block=16)
    values = ckpt.convert_tf1_checkpoint(prefix)
    merged = ckpt.stage1_restore(v, values)
    expect = {n: a for n, a, _ in tensors}
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional1"]["conv"]["kernel"]),
        expect["yolo/convolutional1/weights"])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional59"]["conv"]["bias"]),
        expect["yolo/convolutional59/biases"])
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["convolutional52"]["bn"]["var"]),
        expect["yolo/convolutional52/BatchNorm/moving_variance"])
    # mask subnet untouched (selective restore)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional78"]["conv"]["kernel"]),
        np.asarray(v["params"]["convolutional78"]["conv"]["kernel"]))
