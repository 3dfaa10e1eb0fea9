import json

from difusion_tpu import config as C


def test_yaml_include_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb: 2\n")
    (tmp_path / "child.yaml").write_text("include_configs: base.yaml\nb: 3\nc: 4\n")
    args = C.parse_config_yaml(tmp_path / "child.yaml")
    assert args.a == 1 and args.b == 3 and args.c == 4


def test_lenient_json(tmp_path):
    p = tmp_path / "h.json"
    p.write_text("{'x': None, 'y': True, 'z': False}")
    args = C.parse_config_json(p)
    assert args.x is None and args.y is True and args.z is False


def test_json_comment_keys(tmp_path):
    p = tmp_path / "h.json"
    p.write_text(json.dumps([{"_": "comment", "a": 5}, {"b": 6}]))
    args = C.parse_config_json(p)
    assert args.a == 5 and args.b == 6


def test_parser_flag_promotion(tmp_path):
    p = tmp_path / "h.yaml"
    p.write_text("lr: 0.001\nname: hello\n")
    parser = C.ArgumentParserX()
    args = parser.parse_args([str(p), "--lr", "0.1"])
    assert args.lr == 0.1 and args.name == "hello"


def test_parser_set_override(tmp_path):
    p = tmp_path / "h.yaml"
    p.write_text("lr: 0.001\nmapping:\n  voxel_size: 0.1\nbounds: [0, 1]\n")
    parser = C.ArgumentParserX()
    args = parser.parse_args([str(p), "--set", "lr=42",
                              "--set", "mapping.voxel_size=0.05",
                              "--set", "bounds=[2, 3]"])
    assert args.lr == 42
    assert args.mapping["voxel_size"] == 0.05
    assert args.bounds == [2, 3]


def test_parser_set_rejects_malformed(tmp_path):
    p = tmp_path / "h.yaml"
    p.write_text("lr: 0.001\n")
    parser = C.ArgumentParserX()
    try:
        parser.parse_args([str(p), "--set", "lr"])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_dict_to_args_roundtrip():
    args = C.dict_to_args({"a": 1, "b": {"c": 2}})
    assert args.a == 1 and args.b == {"c": 2}
    assert C.args_to_dict(args) == {"a": 1, "b": {"c": 2}}
