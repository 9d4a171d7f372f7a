"""Native TensorBoard event writer: round-trip + cross-validation against
tensorboardX's writer (when installed) so the hand-rolled framing/proto
match what TB actually reads."""

import glob
import os.path as osp

import pytest

from agrl_tpu.utils.tbevents import (
    EventFileWriter,
    decode_scalar_event,
    read_records,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for castagnoli CRC
    from agrl_tpu.utils.tbevents import _crc32c

    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(bytes(range(32))) == 0x46DD794E
    assert _crc32c(b"123456789") == 0xE3069283


def test_event_file_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("loss/xent_loss", 2.5, 1)
    w.add_scalar("acc/rank1", 0.875, 5)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = read_records(path)  # CRCs verified inside
    assert len(records) == 3
    head = decode_scalar_event(records[0])
    assert head["version"] == "brain.Event:2"
    ev1 = decode_scalar_event(records[1])
    assert ev1["step"] == 1 and ev1["scalars"] == [("loss/xent_loss", 2.5)]
    ev2 = decode_scalar_event(records[2])
    assert ev2["step"] == 5 and ev2["scalars"] == [("acc/rank1", 0.875)]
    assert ev2["wall_time"] and ev2["wall_time"] > 1e9


def test_scalarwriter_emits_tb_and_jsonl(tmp_path):
    from agrl_tpu.utils.logger import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("loss/htri_loss", 0.25, 3)
    w.close()
    assert osp.exists(tmp_path / "scalars.jsonl")
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    recs = read_records(path)
    ev = decode_scalar_event(recs[1])
    assert ev["scalars"] == [("loss/htri_loss", 0.25)] and ev["step"] == 3


def test_reader_parses_tensorboardx_output(tmp_path):
    """Our framing + proto layout must match the ecosystem's: parse a file
    written by tensorboardX (the reference's own dependency) with OUR
    reader and recover the same scalars."""
    tbx = pytest.importorskip("tensorboardX")
    d = str(tmp_path / "tbx")
    w = tbx.SummaryWriter(log_dir=d)
    w.add_scalar("acc/mAP", 0.5, 7)
    w.close()
    (path,) = glob.glob(osp.join(d, "events.out.tfevents.*"))
    recs = read_records(path)  # CRC framing identical
    parsed = [decode_scalar_event(r) for r in recs[1:]]
    scalars = [s for p in parsed for s in p["scalars"]]
    assert ("acc/mAP", 0.5) in scalars
    steps = {p["step"] for p in parsed if p["scalars"]}
    assert 7 in steps
