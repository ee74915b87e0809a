from mi_based_regularized_semi_supervised_segmentation_tpu.config import (
    ConfigManager,
    DEFAULT_CONFIG_PATH,
    dict_merge,
    parse_dotted_overrides,
)


def test_default_config_loads():
    cm = ConfigManager(argv=[])
    cfg = cm.config
    assert cfg["Arch"] == {"input_dim": 1, "num_classes": 4,
                           "stem": "conv", "remat": False}
    assert cfg["Optim"]["lr"] == 1e-7
    assert cfg["Trainer"]["feature_names"] == ["Conv5", "Up_conv3", "Up_conv2"]
    assert cfg["IICRegParameters"]["LossParams"]["paddings"] == [1, 3]


def test_dotted_overrides_yaml_typed():
    out = parse_dotted_overrides(
        ["Optim.lr=1e-5", "Trainer.name=udaiic", "Trainer.feature_importance=[1,0.5]",
         "LabeledData.shuffle=false", "RandomSeed=3"]
    )
    assert out["Optim"]["lr"] == 1e-5
    assert out["Trainer"]["name"] == "udaiic"
    assert out["Trainer"]["feature_importance"] == [1, 0.5]
    assert out["LabeledData"]["shuffle"] is False
    assert out["RandomSeed"] == 3


def test_cli_merge_wins():
    cm = ConfigManager(argv=["Optim.lr=0.001", "Trainer.num_batches=7"])
    cfg = cm.config
    assert cfg["Optim"]["lr"] == 0.001
    assert cfg["Optim"]["weight_decay"] == 1e-5  # untouched sibling preserved
    assert cfg["Trainer"]["num_batches"] == 7
    assert cfg["Trainer"]["max_epoch"] == 100


def test_dict_merge_deep():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    override = {"a": {"b": 10}, "e": 4}
    merged = dict_merge(base, override)
    assert merged == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # no mutation


def test_config_path_swap(tmp_path):
    alt = tmp_path / "alt.yaml"
    alt.write_text("Optim:\n  lr: 0.5\n")
    cm = ConfigManager(argv=["--config_path", str(alt), "Optim.lr=0.25"])
    assert cm.config["Optim"]["lr"] == 0.25
    cm2 = ConfigManager(argv=["--config_path", str(alt)])
    assert cm2.config["Optim"]["lr"] == 0.5


def test_dump_roundtrip(tmp_path):
    cm = ConfigManager(argv=["Trainer.name=uda"])
    out = tmp_path / "run" / "config.yaml"
    cm.dump(out)
    cm2 = ConfigManager(default_path=out, argv=[])
    assert cm2.config["Trainer"]["name"] == "uda"
    assert cm2.config == cm.config
