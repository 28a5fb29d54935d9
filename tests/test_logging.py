"""The dependency-free TensorBoard event writer must produce files that
(a) roundtrip through our own CRC-validating reader and (b) parse with
TensorFlow's own event iterator — the same consumer that reads the
reference's TensorBoard callback output (reference model.py:2346-2348)."""

import glob
import os

import pytest

from mulit_view_object_detection_tpu.utils.logging_utils import (
    MetricsLogger, TBEventWriter, read_tb_events)


def test_tb_writer_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "rpn_class_loss": 0.75})
    w.add_scalars(2, {"loss": 1.25})
    w.close()
    assert os.path.basename(w.path).startswith("events.out.tfevents.")
    events = read_tb_events(w.path)
    assert events == [
        (1, {"loss": 2.5, "rpn_class_loss": 0.75}),
        (2, {"loss": 1.25}),
    ]


def test_tb_reader_rejects_corruption(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 3.0})
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte under the trailing CRC
    open(w.path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="crc"):
        read_tb_events(w.path)


def test_tb_file_parses_with_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(7, {"loss": 0.5, "val_loss": 0.625})
    w.close()
    seen = {}
    for event in tf.compat.v1.train.summary_iterator(w.path):
        for value in event.summary.value:
            seen.setdefault(event.step, {})[value.tag] = value.simple_value
    assert seen == {7: {"loss": 0.5, "val_loss": 0.625}}


def test_metrics_logger_jsonl(tmp_path):
    import json

    m = MetricsLogger(str(tmp_path))
    m.log(3, loss=1.5)
    m.close()
    (rec,) = [json.loads(line) for line in open(m.path)]
    assert rec["step"] == 3 and rec["loss"] == 1.5 and "time" in rec


def find_event_files(root):
    return glob.glob(os.path.join(root, "**", "events.out.tfevents.*"),
                     recursive=True)
