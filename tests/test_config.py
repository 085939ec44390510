"""Config subsystem tests: same_as resolution, yaml floats, strict popping,
dotted overrides (models reference tests_nntrainer/test_configs.py)."""

import pytest

from coot_videotext_tpu.config.base import (
    apply_config_update, parse_dotted_overrides)
from coot_videotext_tpu.utils.general import (
    check_config_dict, get_dict_value_recursively,
    resolve_sameas_config_recursively)
from coot_videotext_tpu.utils.yaml_utils import (
    dump_yaml_config_file, load_yaml_config_file)


def test_sameas_resolution():
    config = {
        "net_a": {"dim": 3, "sub": {"x": 1}},
        "net_b": {"same_as": "net_a", "dim": 7},
        "net_c": {"same_as": "net_a.sub"},
    }
    resolve_sameas_config_recursively(config)
    assert config["net_b"] == {"dim": 7, "sub": {"x": 1}}
    # deep copy, not aliasing
    config["net_b"]["sub"]["x"] = 99
    assert config["net_a"]["sub"]["x"] == 1
    assert config["net_c"] == {"x": 1}


def test_nested_sameas():
    config = {
        "a": {"inner": {"v": 5}},
        "b": {"inner": {"same_as": "a.inner"}},
    }
    resolve_sameas_config_recursively(config)
    assert config["b"]["inner"]["v"] == 5


def test_get_dict_value_recursively():
    d = {"x": {"y": {"z": 42}}}
    assert get_dict_value_recursively(d, "x.y.z") == 42


def test_check_config_dict():
    check_config_dict("t", {})
    check_config_dict("t", {"ref": {"anything": 1}})
    check_config_dict("t", {"leftover_null": None})
    with pytest.raises(ValueError):
        check_config_dict("t", {"unknown_key": 5})


def test_yaml_scientific_floats(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("lr: 3.6e-4\neps: 1.5e-09\nth: 1e-4\nname: hello\nn: 5\n")
    cfg = load_yaml_config_file(f)
    assert cfg["lr"] == pytest.approx(3.6e-4)
    assert cfg["eps"] == pytest.approx(1.5e-9)
    assert cfg["th"] == pytest.approx(1e-4)
    assert cfg["name"] == "hello"
    assert cfg["n"] == 5


def test_yaml_roundtrip(tmp_path):
    data = {"a": 1, "b": {"c": [1, 2, 3], "d": "x"}, "e": 0.5}
    f = tmp_path / "out.yaml"
    dump_yaml_config_file(f, data)
    assert load_yaml_config_file(f) == data


def test_dotted_overrides():
    upd = parse_dotted_overrides(
        "train.batch_size=8,val.flag=true,optimizer.lr=1e-3,name=abc")
    assert upd == {
        "train": {"batch_size": 8},
        "val": {"flag": True},
        "optimizer": {"lr": 1e-3},
        "name": "abc",
    }
    cfg = {"train": {"batch_size": 64, "num_epochs": 2}, "name": "z"}
    apply_config_update(cfg, upd)
    assert cfg["train"] == {"batch_size": 8, "num_epochs": 2}
    assert cfg["name"] == "abc"


def test_reference_retrieval_yaml_parses():
    """The reference's shipped retrieval config must parse into our
    RetrievalConfig with zero leftovers."""
    import pathlib
    ref = pathlib.Path("/root/reference/config/retrieval/paper2020/"
                       "yc2_2d3d_coot.yaml")
    if not ref.is_file():
        pytest.skip("reference configs unavailable")
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    cfg = RetrievalConfig(load_yaml_config_file(ref))
    assert cfg.train.batch_size == 64
    assert cfg.dataset_train.vid_feat_dim == 4096
    assert cfg.model_cfgs["net_video_local"].output_dim == 384
    assert cfg.model_cfgs["net_video_global"].use_context
    assert cfg.model_cfgs["net_text_local"].output_dim == 384
    assert cfg.optimizer.lr == pytest.approx(3.6e-4)
    assert cfg.lr_scheduler.rop_patience == 5


def test_shipped_paper2020_configs_build_and_match_reference():
    """Every shipped config/{retrieval,caption}/paper2020 yaml constructs a
    strict config object with zero leftovers, and (when the reference is
    mounted) resolves to exactly the reference's experiment definition."""
    import pathlib
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.utils.general import (
        resolve_sameas_config_recursively)

    repo = pathlib.Path(__file__).resolve().parents[1]
    ref_root = pathlib.Path("/root/reference")

    def canon(path):
        d = load_yaml_config_file(path)
        resolve_sameas_config_recursively(d)
        d.pop("description", None)
        return d

    checked = 0
    for sub, cls in (("retrieval", RetrievalConfig), ("caption", MartConfig)):
        files = sorted((repo / "config" / sub / "paper2020").glob("*.yaml"))
        assert files, f"no shipped paper2020 {sub} configs"
        for path in files:
            cls(load_yaml_config_file(path))  # strict: leftovers raise
            ref = ref_root / "config" / sub / "paper2020" / path.name
            if ref.is_file():
                assert canon(path) == canon(ref), path.name
                checked += 1
    if ref_root.is_dir():
        assert checked == 10
