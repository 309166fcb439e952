"""TensorBoard event-file sink (utils/tb_writer.py + kvlogger format).

The writer is hand-rolled (no tensorflow in the image), so the tests
pin the wire format itself: known crc32c vectors, TFRecord framing
round-trip with CRC validation, protobuf scalar round-trip, and the
kvlogger 'tensorboard' format end to end.
Reference behavior being replaced: Envs/vec_env/logger.py:139-172.
"""
import glob
import os

import numpy as np

from var_tpu.utils import tb_writer as tb
from var_tpu.utils.kvlogger import KVLogger


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli
    assert tb.crc32c(b"") == 0x00000000
    assert tb.crc32c(b"a") == 0xC1D04330
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(bytes(32)) == 0x8A9136AA


def test_event_roundtrip(tmp_path):
    w = tb.EventFileWriter(str(tmp_path))
    w.add_scalars(7, {"loss": 0.5, "fps": 123.0}, wall_time=1000.0)
    w.add_scalars(8, {"loss": 0.25}, wall_time=1001.5)
    w.close()
    events = tb.read_events(w.path)  # validates both CRCs per record
    # record 0 is the file_version header
    assert len(events) == 3
    wall, step, scalars = events[1]
    assert (wall, step) == (1000.0, 7)
    np.testing.assert_allclose(scalars["loss"], 0.5)
    np.testing.assert_allclose(scalars["fps"], 123.0)
    assert events[2][1] == 8


def test_non_numeric_values_skipped(tmp_path):
    w = tb.EventFileWriter(str(tmp_path))
    w.add_scalars(0, {"note": "hello", "x": 1.0})
    w.add_scalars(1, {"only": "strings"})  # writes nothing
    w.close()
    events = tb.read_events(w.path)
    assert len(events) == 2
    assert events[1][2] == {"x": 1.0}


def test_kvlogger_tensorboard_format(tmp_path):
    lg = KVLogger(str(tmp_path), formats=["tensorboard"])
    lg.logkv("nupdates", 3)
    lg.logkv("eprewmean", 1.25)
    lg.dumpkvs()
    lg.logkv("eprewmean", 2.5)  # no nupdates -> falls back to counter
    lg.dumpkvs()
    files = glob.glob(os.path.join(str(tmp_path), "tb",
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    events = tb.read_events(files[0])
    assert len(events) == 3
    assert events[1][1] == 3  # step from nupdates
    np.testing.assert_allclose(events[1][2]["eprewmean"], 1.25)
    np.testing.assert_allclose(events[2][2]["eprewmean"], 2.5)
