"""Per-operator golden tests on tiny deterministic Arrow tables —
the reference's TestTransforms pattern (literal expected values,
``datavec-api/src/test/.../TestTransforms.java``)."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.pipeline import TransformPipeline
from datavec_ray.schema import Schema
from datavec_ray.steps import *  # noqa: F401,F403
from datavec_ray.conditions import ColumnCondition, IsNullCondition


def base_table():
    return pa.table({
        "s": ["hello world", "", None, "FOO bar", "x,y,z"],
        "i": pa.array([1, 2, 3, 4, 5], pa.int32()),
        "l": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "d": pa.array([1.0, 2.5, float("nan"), 4.0, -1.0]),
        "cat": ["a", "b", "c", "a", "b"],
        "t": pa.array([1700000000000, 1700000060000, 1700003600000,
                       1700086400000, 1700090000000], pa.timestamp("ms")),
        "vec": pa.array([[1.0, 2.0], [3.0, 4.0], [0.0, 1.0], [1.0, 0.0],
                         [2.0, 2.0]], pa.list_(pa.float32())),
    })


def schema():
    s = Schema(base_table().schema)
    s.meta_of("cat").states = ["a", "b", "c"]
    return s


def run1(step, table=None):
    t = table if table is not None else base_table()
    p = TransformPipeline(Schema(t.schema) if table is not None else schema())
    p.add(step)
    return p.execute_table(t)


# -- column steps ------------------------------------------------------------

def test_remove_keep_rename_reorder_duplicate():
    t = base_table()
    assert run1(RemoveColumns(["s", "vec"])).column_names == ["i", "l", "d", "cat", "t"]
    assert run1(KeepColumns(["d", "i"])).column_names == ["d", "i"]
    assert run1(RenameColumns({"i": "int_col"})).column_names[1] == "int_col"
    assert run1(ReorderColumns(["t", "d"])).column_names[:2] == ["t", "d"]
    out = run1(DuplicateColumns(["i"], ["i2"]))
    assert out["i2"].equals(out["i"])


def test_add_constant():
    out = run1(AddConstantColumn("c1", "Long", 7))
    assert out["c1"].to_pylist() == [7] * 5
    assert out["c1"].type == pa.int64()


# -- math --------------------------------------------------------------------

def test_integer_math_ops():
    assert run1(IntegerMathOp("i", "Add", 10))["i"].to_pylist() == [11, 12, 13, 14, 15]
    assert run1(IntegerMathOp("i", "Multiply", 3))["i"].to_pylist() == [3, 6, 9, 12, 15]
    assert run1(IntegerMathOp("i", "Divide", 2))["i"].to_pylist() == [0, 1, 1, 2, 2]
    assert run1(IntegerMathOp("i", "Modulus", 2))["i"].to_pylist() == [1, 0, 1, 0, 1]
    assert run1(IntegerMathOp("i", "ReverseSubtract", 10))["i"].to_pylist() == [9, 8, 7, 6, 5]
    assert run1(IntegerMathOp("i", "ScalarMax", 3))["i"].to_pylist() == [3, 3, 3, 4, 5]
    assert run1(IntegerMathOp("i", "ScalarMin", 3))["i"].to_pylist() == [1, 2, 3, 3, 3]


def test_double_math_and_function():
    out = run1(DoubleMathOp("d", "Multiply", 2.0))["d"].to_pylist()
    assert out[0] == 2.0 and out[3] == 8.0
    out = run1(DoubleMathFunction("d", "ABS"))["d"].to_pylist()
    assert out[4] == 1.0
    out = run1(DoubleMathFunction("d", "FLOOR"))["d"].to_pylist()
    assert out[1] == 2.0


def test_columns_math_op():
    out = run1(DoubleColumnsMathOp("sum_il", "Add", ["i", "l"]))
    assert out["sum_il"].to_pylist() == [11.0, 22.0, 33.0, 44.0, 55.0]
    out = run1(IntegerColumnsMathOp("im", "Multiply", ["i", "i"]))
    assert out["im"].to_pylist() == [1, 4, 9, 16, 25]
    assert out["im"].type == pa.int32()


def test_casts_and_parse():
    assert run1(ConvertToDouble("i"))["i"].type == pa.float64()
    assert run1(ConvertToString("i"))["i"].to_pylist() == ["1", "2", "3", "4", "5"]
    t = pa.table({"x": ["1.5", "2", "-3.25"]})
    assert run1(ParseDouble("x"), t)["x"].to_pylist() == [1.5, 2.0, -3.25]
    # float→int truncates toward zero (Java cast semantics)
    t2 = pa.table({"x": [1.9, -2.7]})
    assert run1(ConvertToInteger("x"), t2)["x"].to_pylist() == [1, -2]


def test_replace_empty_invalid():
    t = pa.table({"x": ["1", "", None, "7", "42"]})
    assert run1(ReplaceEmptyWithValue("x", 0, "Integer"), t)["x"].to_pylist() == \
        [1, 0, 0, 7, 42]
    t2 = pa.table({"x": ["1", "", None, "bad", "42"]})
    out = run1(ReplaceInvalidWithValue("x", -1, "Integer"), t2)
    assert out["x"].to_pylist() == [1, -1, -1, -1, 42]


def test_time_math_and_derive():
    out = run1(TimeMathOp("t", "Add", 1, "HOURS"))
    assert out["t"][0].as_py().hour != base_table()["t"][0].as_py().hour
    out = run1(DeriveColumnsFromTime("t", [["year", "yr"], ["epoch_ms", "ems"]]))
    assert out["yr"].to_pylist() == [2023] * 5
    assert out["ems"][0].as_py() == 1700000000000


# -- string ------------------------------------------------------------------

def test_string_steps():
    assert run1(AppendString("s", "!"))["s"][0].as_py() == "hello world!"
    assert run1(ChangeCase("s", "UPPER"))["s"][0].as_py() == "HELLO WORLD"
    out = run1(ConcatenateStringColumns("cc", "-", ["cat", "cat"]))
    assert out["cc"].to_pylist() == ["a-a", "b-b", "c-c", "a-a", "b-b"]
    out = run1(MapAllStringsExceptList("cat", ["a"], "other"))
    assert out["cat"].to_pylist() == ["a", "other", "other", "a", "other"]
    t = pa.table({"x": [" a b\tc "]})
    assert run1(RemoveWhiteSpace("x"), t)["x"][0].as_py() == "abc"
    assert run1(ReplaceEmptyString("s", "E"))["s"].to_pylist()[1] == "E"
    out = run1(RegexReplace("s", [["o", "0"]]))
    assert out["s"][0].as_py() == "hell0 w0rld"
    out = run1(StringMap("cat", {"a": "alpha"}))
    assert out["cat"].to_pylist() == ["alpha", "b", "c", "alpha", "b"]


def test_regex_extract():
    t = pa.table({"x": ["k=1 v=a", "k=22 v=bb", "no match", None]})
    out = run1(RegexExtract("x", r"k=(?P<knum>\d+) v=(?P<vstr>\w+)"), t)
    assert out["knum"].to_pylist() == ["1", "22", None, None]
    assert out["vstr"].to_pylist() == ["a", "bb", None, None]
    assert out["x"].to_pylist()[0] == "k=1 v=a"  # source kept
    # overwrite-in-place when a group name collides with an existing column
    t2 = pa.table({"x": ["a=9"], "a": ["old"]})
    out2 = run1(RegexExtract("x", r"a=(?P<a>\d+)"), t2)
    assert out2["a"].to_pylist() == ["9"]
    with pytest.raises(ValueError):
        RegexExtract("x", r"k=(\d+)")  # unnamed groups rejected
    # serde round-trip
    d = RegexExtract("x", r"k=(?P<k>\d+)").to_dict()
    assert d["cls"] == "RegexExtract" and "pattern" in d


def test_string_list_steps():
    t = pa.table({"x": ["x,y", "z", "x,x,q", ""]})
    out = run1(StringListToCounts("x", ["x", "y", "z"], ","), t)
    assert out["x"].to_pylist() == [[1, 1, 0], [0, 0, 1], [2, 0, 0], [0, 0, 0]]
    out = run1(StringListToIndicator("x", ["x", "y", "z"], ","), t)
    assert out["x"].to_pylist() == [[1, 1, 0], [0, 0, 1], [1, 0, 0], [0, 0, 0]]
    out = run1(StringListToIndices("x", ["x", "y", "z"], ","), t)
    assert out["x"].to_pylist() == [[0, 1], [2], [0, 0], []]
    out = run1(StringListToCategoricalSet("x", ["has_x", "has_y", "has_z"],
                                          ["x", "y", "z"], ","), t)
    assert out["has_x"].to_pylist() == [True, False, True, False]
    assert out.column_names[:3] == ["has_x", "has_y", "has_z"]


# -- categorical -------------------------------------------------------------

def test_categorical_steps():
    assert run1(CategoricalToInteger("cat"))["cat"].to_pylist() == [0, 1, 2, 0, 1]
    out = run1(CategoricalToOneHot("cat"))
    assert out["cat[a]"].to_pylist() == [1, 0, 0, 1, 0]
    assert "cat" not in out.column_names
    t = pa.table({"x": pa.array([0, 2, 1], pa.int32())})
    assert run1(IntegerToCategorical("x", ["lo", "mid", "hi"]), t)["x"].to_pylist() == \
        ["lo", "hi", "mid"]
    out = run1(IntegerToOneHot("i", 1, 3))
    assert out["i[1]"].to_pylist() == [1, 0, 0, 0, 0]
    assert out["i[3]"].to_pylist() == [0, 0, 1, 0, 0]


def test_pivot():
    out = run1(Pivot("cat", "i", default_value=0))
    assert out["cat[a]"].to_pylist() == [1, 0, 0, 4, 0]
    assert out["cat[b]"].to_pylist() == [0, 2, 0, 0, 5]
    assert "cat" not in out.column_names and "i" not in out.column_names


# -- ndarray -----------------------------------------------------------------

def test_ndarray_steps():
    out = run1(NDArrayScalarOp("vec", "Multiply", 2.0))
    assert out["vec"][0].as_py() == [2.0, 4.0]
    out = run1(NDArrayColumnsMathOp("v2", "Add", ["vec", "vec"]))
    assert out["v2"][1].as_py() == [6.0, 8.0]
    out = run1(NDArrayDistance("dist", "COSINE", "vec", "vec"))
    assert abs(out["dist"][0].as_py() - 1.0) < 1e-9
    out = run1(NDArrayDistance("dist", "EUCLIDEAN", "vec", "vec"))
    assert out["dist"][0].as_py() == 0.0


# -- conditions / conditional steps / filters --------------------------------

def test_conditional_replace_and_filter():
    out = run1(ConditionalReplaceValue("i", 0, ColumnCondition("i", "GreaterThan", 3)))
    assert out["i"].to_pylist() == [1, 2, 3, 0, 0]
    out = run1(ConditionalReplaceValueWithDefault(
        "i", 1, 0, ColumnCondition("d", "GreaterThan", 2.0)))
    assert out["i"].to_pylist() == [0, 1, 0, 1, 0]  # NaN row -> condition false
    out = run1(ConditionalCopyValue("i", "l", ColumnCondition("i", "Equal", 2)))
    assert out["i"].to_pylist() == [1, 20, 3, 4, 5]
    out = run1(ConditionFilter(ColumnCondition("i", "LessThan", 3)))
    assert out["i"].to_pylist() == [3, 4, 5]
    out = run1(ConditionFilter(IsNullCondition("s")))
    assert out.num_rows == 4


def test_filter_invalid():
    s = Schema.builder().add_integer("x", min_value=0, max_value=10).build()
    t = pa.table({"x": pa.array([5, -1, 11, None, 3], pa.int32())})
    p = TransformPipeline(s).add(FilterInvalidValues(["x"]))
    assert p.execute_table(t)["x"].to_pylist() == [5, 3]


def test_schema_propagation_fails_fast():
    with pytest.raises(KeyError):
        TransformPipeline(schema()).add(IntegerMathOp("nope", "Add", 1))
    with pytest.raises(TypeError):
        TransformPipeline(schema()).add(IntegerMathOp("d", "Add", 1))


def test_pipeline_serde_roundtrip():
    p = TransformPipeline(schema())
    p.add(IntegerMathOp("i", "Add", 10))
    p.add(ConditionalReplaceValue("i", 0, ColumnCondition("i", "GreaterThan", 13)))
    p.add(CategoricalToOneHot("cat"))
    p2 = TransformPipeline.from_json(p.to_json())
    a = p.execute_table(base_table())
    b = p2.execute_table(base_table())
    assert a.schema == b.schema
    assert a.drop_columns(["d"]).equals(b.drop_columns(["d"]))  # d has NaN


def test_normalize_text():
    from datavec_ray.steps.string import NormalizeText

    t = pa.table({"s": pa.array(
        ["Café  \t X\x7fY ",      # combining accent + ctrl + runs
         "plain  ascii",
         None,
         "é"],                      # precomposed stays precomposed
        pa.string())})
    out = NormalizeText("s", lower=True).apply(t)
    assert out["s"].to_pylist() == ["café xy", "plain ascii", None, "é"]
    # NFC really composes: 'e'+U+0301 collapses to one codepoint
    assert len(out["s"][0].as_py()) == len("cafe xy")
    # serde round-trip through the registry
    from datavec_ray.pipeline import TransformPipeline
    from datavec_ray.schema import Schema
    s = Schema.builder().add_string("s").build()
    p = TransformPipeline(s).add(NormalizeText("s", lower=True))
    p2 = TransformPipeline.from_json(p.to_json())
    assert p2.execute_table(t)["s"].to_pylist() == out["s"].to_pylist()
    # ASCII-only batches never enter the per-row path (identity check)
    t2 = pa.table({"s": pa.array(["abc  def", " x "], pa.string())})
    assert NormalizeText("s").apply(t2)["s"].to_pylist() == ["abc def", "x"]
    with pytest.raises(ValueError):
        NormalizeText("s", form="XXX")
