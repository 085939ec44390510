"""
Results-viewer tests: schema compatibility of collect/average/output with
the experiment dirs this framework writes, and (when the reference repo is
mounted) byte-level agreement with the reference's published README table
from its provided_experiments files.
"""

import io
from pathlib import Path

import numpy as np
import pytest

from coot_videotext_tpu.utils.view_results import (
    average_results_data, collect_results_data, match_folder,
    output_results)

# the reference's published run metrics are vendored in-repo (45 tiny
# json/yaml files) so the README-table reproduction works standalone
REFERENCE_EXPERIMENTS = (Path(__file__).resolve().parent / "fixtures"
                         / "provided_experiments")


def test_reference_provided_experiments_readme_table():
    """Reproduce the reference README numbers from its own metric files
    (README.md:156-158)."""
    groups = match_folder(REFERENCE_EXPERIMENTS, "retrieval")
    collector = collect_results_data(
        "retrieval", groups, log_dir=str(REFERENCE_EXPERIMENTS))
    assert len(collector) == 9  # 3 configs x 3 runs
    for metrics in collector.values():
        metrics["vp-r1"] = (metrics["val_base/vid2par-r1"]
                            + metrics["val_base/par2vid-r1"]) / 2
    mean_c, std_c, num = average_results_data(collector,
                                              group_by_names=True)
    anet = mean_c["anet_coot_run"]
    np.testing.assert_allclose(anet["val_base/vid2par-r1"], 0.6144,
                               atol=5e-5)
    np.testing.assert_allclose(anet["val_base/par2vid-r1"], 0.6156,
                               atol=5e-5)
    yc2 = mean_c["yc2_100m_coot_run"]
    np.testing.assert_allclose(yc2["val_base/vid2par-r1"], 0.7535,
                               atol=5e-5)
    yc2_2d3d = mean_c["yc2_2d3d_coot_run"]
    np.testing.assert_allclose(yc2_2d3d["val_base/vid2par-r1"], 0.4872,
                               atol=5e-5)
    assert num["anet_coot_run"] == 3

    # table renders without error
    buf = io.StringIO()
    output_results(collector, mean=True, compact=True, sort="alpha",
                   print_fn=lambda *a: buf.write(" ".join(map(str, a))
                                                 + "\n"))
    out = buf.getvalue()
    assert "anet_coot_run (3)" in out


def test_ab_compare_reads_committed_evidence():
    """tools/ab_compare.py parses the committed A/B metric evidence
    (docs/ab_evidence) — locks the metrics-json schema the PARITY.md
    trajectories are built from."""
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    try:
        import ab_compare
    finally:
        sys.path.pop(0)
    runs = {p.name: p for p in (repo / "docs" / "ab_evidence").iterdir()
            if (p / "metrics").is_dir()}
    ret = {n: ab_compare.load_run(p) for n, p in runs.items()
           if "yc2like" in n}
    cap = {}
    ab_compare.FIELDS = ab_compare.CAPTION_FIELDS
    try:
        cap = {n: ab_compare.load_run(p) for n, p in runs.items()
               if "capsynth" in n}
    finally:
        ab_compare.FIELDS = ab_compare.RETRIEVAL_FIELDS
    assert len(ret) >= 4  # 2 ref seeds + 2 tpu seeds
    for name, eps in ret.items():
        assert len(eps) >= 30, name  # full trajectories survived cleanup
        first, last = eps[min(eps)], eps[max(eps)]
        assert first["vloss"] > 1.5 and last["vloss"] < 0.1, name
        assert last["v2p@1"] >= 0.97, name
        assert last["c2s@1"] >= 0.95, name
    assert len(cap) >= 4
    for name, eps in cap.items():
        first, last = eps[min(eps)], eps[max(eps)]
        assert first["vloss"] > 3.0 and last["vloss"] < 1.5, name


def test_embeddings_retrieval_cli(tmp_path, monkeypatch, capsys):
    """Offline retrieval CLI on a saved embeddings h5, both the current
    schema and the reference's legacy *_norm keys (reference
    test_embeddings_retrieval.py:22-30)."""
    import sys
    import h5py
    import numpy as np
    import test_embeddings_retrieval as tool

    rng = np.random.RandomState(0)
    n, d = 12, 16
    emb = rng.randn(n, d).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    for variant, keys in (
            ("new", ("vid_emb", "par_emb", "clip_emb", "sent_emb")),
            ("legacy", ("vid_norm", "par_norm", "clip_norm",
                        "sent_norm"))):
        path = tmp_path / f"embeddings_{variant}.h5"
        with h5py.File(path, "w") as h5:
            for k in keys:
                # identical embeddings per pair -> perfect retrieval
                h5[k] = emb
        monkeypatch.setattr(sys, "argv", ["x", str(path)])
        tool.main()
        out = capsys.readouterr().out
        assert "R@1" in out
        # self-retrieval of identical sets is perfect
        assert "100.0" in out or "1.000" in out, out
