"""The dependency-free TensorBoard event writer must produce files the
REAL TensorBoard event loader parses back exactly (tags, steps, values,
file version). tensorboard is a test-only dependency here — the library
module (utils/tensorboard.py) hand-encodes the wire format."""

import math

import pytest

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def _load_events(path):
    return list(tb_loader.EventFileLoader(path).Load())


def _value(v):
    # modern loaders migrate simple_value to a rank-0 tensor
    if v.WhichOneof("value") == "simple_value":
        return v.simple_value
    return v.tensor.float_val[0]


def test_scalar_roundtrip(tmp_path):
    from dawn_tpu.utils.tensorboard import EventWriter
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.125, step=0)
    w.add_scalar("train/loss", 0.0625, step=10)
    w.add_scalar("lr", 3e-4, step=10)
    w.close()

    events = _load_events(w.path)
    assert events[0].file_version == "brain.Event:2"
    scalars = [(v.tag, e.step, _value(v))
               for e in events[1:] for v in e.summary.value]
    assert scalars[0] == ("train/loss", 0, 0.125)
    assert scalars[1] == ("train/loss", 10, 0.0625)
    assert scalars[2][0:2] == ("lr", 10)
    assert math.isclose(scalars[2][2], 3e-4, rel_tol=1e-6)
    assert all(e.wall_time > 1e9 for e in events)


def test_add_scalars_dict_skips_non_numeric(tmp_path):
    from dawn_tpu.utils.tensorboard import EventWriter
    w = EventWriter(str(tmp_path))
    w.add_scalars({"loss": 1.0, "name": "not-a-number", "acc": 0.5},
                  step=3, prefix="train/")
    w.close()
    tags = {v.tag for e in _load_events(w.path) for v in e.summary.value}
    assert tags == {"train/loss", "train/acc"}


def test_crc32c_known_vectors():
    # RFC 3720 (iSCSI) CRC32C check values — pins the table/algorithm
    from dawn_tpu.utils.tensorboard import _crc32c
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_negative_step_and_int64(tmp_path):
    # torch global_step is occasionally -1 in reference resume paths;
    # the two's-complement varint must roundtrip
    from dawn_tpu.utils.tensorboard import EventWriter
    w = EventWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=-1)
    w.add_scalar("x", 2.0, step=2**40)
    w.close()
    steps = [e.step for e in _load_events(w.path) if e.summary.value]
    assert steps == [-1, 2**40]
