"""Config system tests (behavioral parity: efficientdet/hparams_config_test.py)."""

import pytest

from automl_tpu.config import Config, _parse_override_str, parse_scalar


def test_attr_access_nested():
  c = Config({"a": 1, "b": {"c": 2.5, "d": "x"}})
  assert c.a == 1
  assert c.b.c == 2.5
  assert c.b.d == "x"
  c.b.c = 3.0
  assert c.b.c == 3.0


def test_override_string():
  c = Config({"a": 1, "b": {"c": 2.0, "flag": True}, "s": "hello"})
  c.override("a=5,b.c=7,b.flag=false,s=world")
  assert c.a == 5 and c.b.c == 7.0 and c.b.flag is False and c.s == "world"
  assert isinstance(c.b.c, float)


def test_override_strict_unknown_key():
  c = Config({"a": 1})
  with pytest.raises(KeyError):
    c.override("nope=2")
  c.update({"nope": 2})
  assert c.nope == 2


def test_star_list_and_pipe():
  c = Config({"dims": [1, 2], "nested": None})
  c.override("dims=4*2*1")
  assert c.dims == [4, 2, 1]
  c.override("nested=1*2|3*4")
  assert c.nested == [[1, 2], [3, 4]]


def test_scalar_parsing():
  assert parse_scalar("None") is None
  assert parse_scalar("true") is True
  assert parse_scalar("3") == 3
  assert parse_scalar("3.5") == 3.5
  assert parse_scalar("abc") == "abc"


def test_yaml_roundtrip(tmp_path):
  c = Config({"a": 1, "b": {"c": [1, 2, 3]}})
  p = tmp_path / "cfg.yaml"
  c.save_to_yaml(str(p))
  c2 = Config.from_yaml(str(p))
  assert c2 == c
  c3 = Config({"a": 0, "b": {"c": []}})
  c3.override(str(p))
  assert c3.a == 1 and c3.b.c == [1, 2, 3]


def test_parse_override_str_nested():
  d = _parse_override_str("x.y.z=1,w=a")
  assert d == {"x": {"y": {"z": 1}}, "w": "a"}


def test_deepcopy_independent():
  import copy
  c = Config({"a": {"b": 1}})
  c2 = copy.deepcopy(c)
  c2.a.b = 9
  assert c.a.b == 1


def test_brackets_survive_commas():
  c = Config({"size": "x"})
  c.override("size=(512,512)")
  assert c.size == "(512,512)"
