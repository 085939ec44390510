"""
Unit tests for the metrics meters/writer and the host->device prefetch
pipeline (reference test intents: tests_nntrainer/test_metrics.py and
test_multiproc.py).
"""

from pathlib import Path
from types import SimpleNamespace

import numpy as np

from coot_videotext_tpu.data.pipeline import PrefetchIterator
from coot_videotext_tpu.utils.metrics import AverageMeter, MetricsWriter


def test_averagemeter():
    """Golden semantics from reference tests_nntrainer/test_metrics.py."""
    meter = AverageMeter()
    meter.update(4, 2)
    assert (meter.value, meter.sum, meter.count, meter.avg) == (4, 8, 2, 4)
    meter.update(1)
    assert (meter.value, meter.sum, meter.count, meter.avg) == (1, 9, 3, 3)
    meter.reset()
    assert (meter.value, meter.sum, meter.count, meter.avg) == (0, 0, 0, 0)


def _fake_exp(tmp_path: Path):
    tb = tmp_path / "tb"
    tb.mkdir(exist_ok=True)
    return SimpleNamespace(
        path_tensorb=tb,
        get_metrics_step_file=lambda ep: tmp_path / f"metrics_step_{ep}.json",
        get_metrics_epoch_file=(
            lambda ep: tmp_path / f"metrics_epoch_{ep}.json"))


def test_metrics_writer_roundtrip(tmp_path):
    exp = _fake_exp(tmp_path)
    writer = MetricsWriter(exp)
    writer.add_meter("train_base/loss", per_step=True, use_avg=True)
    writer.add_meter("val_base/score", per_step=False, use_avg=False)

    for step, loss in enumerate([2.0, 1.0]):
        writer.update_meter("train_base/loss", loss)
        writer.feed_metrics_step(step, current_epoch=0)
    writer.update_meter("val_base/score", 0.5)
    writer.feed_metrics_epoch(2, current_epoch=0)
    writer.save_epoch(0)
    writer.close()

    reader = MetricsWriter(_fake_exp(tmp_path))
    reader.load_epoch(0)
    steps = reader.storage_step["train_base/loss"]
    assert [v for _, v in steps] == [2.0, 1.0]
    avg = reader.storage_step["train_base/loss-avg"]
    assert [v for _, v in avg] == [2.0, 1.5]
    assert reader.storage_epoch["val_base/score"] == [[0, 0.5]]
    # tensorboard sink wrote an event file when a writer is available
    from coot_videotext_tpu.utils.metrics import SummaryWriter
    if SummaryWriter is not None:
        assert any(exp.path_tensorb.iterdir())


def test_prefetch_iterator_order_and_host_keys():
    batches = [
        {"x": np.full((2, 3), i, np.float32), "key": [f"k{i}a", f"k{i}b"]}
        for i in range(5)
    ]
    seen = []
    for device, host in PrefetchIterator(iter(batches), prefetch=2):
        assert "key" in host and "key" not in device
        seen.append((int(np.asarray(device["x"])[0, 0]), host["key"][0]))
    assert seen == [(i, f"k{i}a") for i in range(5)]


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield {"x": np.zeros((1,), np.float32)}
        raise RuntimeError("boom")

    items = []
    try:
        for item in PrefetchIterator(gen(), prefetch=2):
            items.append(item)
        raised = False
    except RuntimeError as e:
        raised = "boom" in str(e)
    assert raised and len(items) == 1
