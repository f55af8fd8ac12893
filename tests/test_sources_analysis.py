"""Sources/sinks round-trips (reference reader-test style) + analysis,
normalizer and NLP step tests."""

import os

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.schema import Schema
from datavec_ray.util import dataset_to_table


def test_csv_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_csv_records, write_csv
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [1.5, 2.5, 3.5]})
    write_csv(rd.from_arrow(t), str(tmp_path / "csv"))
    back = dataset_to_table(read_csv_records(str(tmp_path / "csv"))).sort_by("a")
    assert back.equals(t)


def test_csv_with_schema(ray_session, tmp_path):
    from datavec_ray.sources import read_csv_records
    p = tmp_path / "x.csv"
    p.write_text("1,foo,2.5\n2,bar,3.5\n")
    sch = Schema.builder().add_long("id").add_string("name").add_double("v").build()
    out = dataset_to_table(read_csv_records(str(p), schema=sch)).sort_by("id")
    assert out.column_names == ["id", "name", "v"]
    assert out["v"].to_pylist() == [2.5, 3.5]


def test_lines_and_regex(ray_session, tmp_path):
    from datavec_ray.sources import read_lines, read_regex_lines
    p = tmp_path / "log.txt"
    p.write_text("2024-01-01 INFO hello\n2024-01-02 WARN bad\nnot-a-log-line\n")
    assert dataset_to_table(read_lines(str(p))).num_rows == 3
    out = dataset_to_table(read_regex_lines(
        str(p), r"(\d{4}-\d{2}-\d{2}) (\w+) (.*)", ["date", "level", "msg"]))
    out = out.sort_by("date")
    assert out.num_rows == 2  # non-matching line dropped
    assert out["level"].to_pylist() == ["INFO", "WARN"]


def test_svmlight_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_svmlight, write_svmlight
    p = tmp_path / "data.svm"
    p.write_text("1 1:0.5 3:2\n0 2:1\n")
    ds = read_svmlight(str(p), num_features=3)
    t = dataset_to_table(ds)
    assert t["features"].to_pylist() == [[0.5, 0.0, 2.0], [0.0, 1.0, 0.0]]
    outdir = str(tmp_path / "out_svm")
    write_svmlight(rd.from_arrow(t), outdir)
    back = dataset_to_table(read_svmlight(outdir, num_features=3))
    a = sorted(map(tuple, t.to_pandas().features))
    b = sorted(map(tuple, back.to_pandas().features))
    assert a == b


def test_json_records(ray_session, tmp_path):
    from datavec_ray.sources import read_json_records
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": {"b": 1}, "c": "x"}\n{"a": {"b": 2}}\n')
    out = dataset_to_table(read_json_records(
        str(p), {"ab": ("a.b", -1), "c": ("c", "missing")})).sort_by("ab")
    assert out["ab"].to_pylist() == [1, 2]
    assert out["c"].to_pylist() == ["x", "missing"]


def test_write_records_partitioned(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_records, write_records
    t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out = str(tmp_path / "lake")
    write_records(rd.from_arrow(t), out, partition_cols=["k"])
    assert set(os.listdir(out)) >= {"k=a", "k=b"}
    back = dataset_to_table(read_records(out))
    assert back.num_rows == 3


# -- analysis ---------------------------------------------------------------

def test_analyze_numeric_and_string(ray_session):
    import ray.data as rd
    from datavec_ray.analysis import analyze
    t = pa.table({"x": [1.0, -2.0, 0.0, 4.0, None],
                  "s": ["", "abc", "12", None, "zz"]})
    local = analyze(t)
    assert local["x"]["count"] == 4
    assert local["x"]["count_missing"] == 1
    assert local["x"]["count_zero"] == 1
    assert local["x"]["count_positive"] == 2
    assert local["x"]["count_negative"] == 1
    assert local["x"]["min"] == -2.0 and local["x"]["max"] == 4.0
    assert abs(local["x"]["mean"] - 0.75) < 1e-12
    assert local["s"]["count_empty"] == 1
    assert local["s"]["count_alphabetic"] == 2
    assert local["s"]["count_numeric_string"] == 1
    dist = analyze(rd.from_arrow(t).repartition(2))
    for col in ("x", "s"):
        for k, v in local[col].items():
            dv = dist[col][k]
            if isinstance(v, float):
                assert abs(dv - v) < 1e-9, (col, k)
            else:
                assert dv == v, (col, k)


def test_histogram(ray_session):
    import ray.data as rd
    from datavec_ray.analysis import histogram
    t = pa.table({"x": list(np.linspace(0, 10, 101))})
    edges, counts = histogram(t, "x", bins=10)
    assert counts.sum() == 101
    _, dcounts = histogram(rd.from_arrow(t).repartition(3), "x", bins=10,
                           lo=0.0, hi=10.0)
    assert (counts == dcounts).all()


def test_quality(ray_session):
    import ray.data as rd
    from datavec_ray.analysis import analyze_quality
    sch = Schema.builder().add_integer("x", min_value=0).add_string(
        "s", regex=r"[a-z]+").build()
    t = pa.table({"x": pa.array([1, -2, None, 4], pa.int32()),
                  "s": ["ok", "BAD", None, "fine"]})
    q = analyze_quality(t, sch)
    assert q["x"] == {"count_total": 4, "count_missing": 1,
                      "count_invalid": 1, "count_valid": 2}
    assert q["s"]["count_valid"] == 2
    qd = analyze_quality(rd.from_arrow(t), sch)
    assert qd == q


def test_sequence_length_analysis(ray_session):
    import ray.data as rd
    from datavec_ray.analysis import sequence_length_analysis
    t = pa.table({"k": ["a"] * 3 + ["b"] * 5 + ["c"]})
    st = sequence_length_analysis(rd.from_arrow(t), "k")
    assert st["num_sequences"] == 3
    assert st["min"] == 1 and st["max"] == 5
    assert abs(st["mean"] - 3.0) < 1e-12


def test_normalizers(ray_session):
    import ray.data as rd
    from datavec_ray.pipeline import TransformPipeline
    from datavec_ray.steps.normalize import fit_normalizer
    t = pa.table({"x": [0.0, 5.0, 10.0]})
    for mode, expect in [("MinMax", [0.0, 0.5, 1.0]),
                         ("SubtractMean", [-5.0, 0.0, 5.0])]:
        step = fit_normalizer(t, mode, "x")
        out = TransformPipeline(Schema(t.schema)).add(step).execute_table(t)
        assert out["x"].to_pylist() == expect
    std = fit_normalizer(rd.from_arrow(t), "Standardize", "x")
    out = std.apply(t)
    assert abs(out["x"][1].as_py()) < 1e-12
    # serde carries the fitted stats
    from datavec_ray.pipeline import TransformPipeline as TP
    p = TP(Schema(t.schema)).add(fit_normalizer(t, "MinMax", "x"))
    assert TP.from_json(p.to_json()).execute_table(t)["x"].to_pylist() == \
        [0.0, 0.5, 1.0]


def test_tfidf_two_pass(ray_session):
    import ray.data as rd
    from datavec_ray.steps.nlp import TfidfVectorize, fit_tfidf_vocab
    t = pa.table({"text": ["cat dog", "dog fish", "cat cat bird"]})
    model_local = fit_tfidf_vocab(t)
    model_dist = fit_tfidf_vocab(rd.from_arrow(t).repartition(2))
    assert model_local["vocab"].keys() == model_dist["vocab"].keys()
    assert model_local["n_docs"] == model_dist["n_docs"] == 3
    v = TfidfVectorize(model_local)
    out = v(t)
    cat_idx = model_local["vocab"]["cat"]
    assert out["tfidf"][2].as_py()[cat_idx] > out["tfidf"][0].as_py()[cat_idx]


def test_text_expansions():
    from datavec_ray.pipeline import TransformPipeline
    from datavec_ray.steps.nlp import TextToCharacterIndex, TextToTermIndex
    t = pa.table({"id": [1, 2], "text": ["ab", "ba c"]})
    p = TransformPipeline(Schema(t.schema))
    p.add(TextToCharacterIndex("text", "abc"))
    out = p.execute_table(t)
    # "ba c": the space is outside the alphabet and is dropped
    assert out["id"].to_pylist() == [1, 1, 2, 2, 2]
    assert out["char_idx"].to_pylist() == [0, 1, 1, 0, 2]
    assert out["seq_pos"].to_pylist() == [0, 1, 0, 1, 2]
    p2 = TransformPipeline(Schema(t.schema))
    p2.add(TextToTermIndex("text", ["ab", "ba", "c"]))
    out2 = p2.execute_table(t)
    assert out2["term_idx"].to_pylist() == [0, 1, 2]
    assert out2["seq_pos"].to_pylist() == [0, 0, 1]


def test_incremental_transformer():
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.pipeline import TransformPipeline
    from datavec_ray.serve import IncrementalTransformer
    from datavec_ray.steps import ConditionFilter, IntegerMathOp
    import pyarrow as pa
    from datavec_ray.schema import Schema
    sch = Schema.builder().add_integer("x").add_string("s").build()
    p = TransformPipeline(sch)
    p.add(IntegerMathOp("x", "Add", 10))
    p.add(ConditionFilter(ColumnCondition("x", "GreaterThan", 100)))
    t = IncrementalTransformer(p.to_json())  # hot-swap path: from JSON
    assert t.transform_record({"x": 1, "s": "a"}) == {"x": 11, "s": "a"}
    assert t.transform_record({"x": 200, "s": "b"}) is None
    out = t.transform_batch([{"x": 1, "s": "a"}, {"x": 200, "s": "b"}])
    assert out == [{"x": 11, "s": "a"}]
    # wide steps rejected like the reference's per-record execute
    from datavec_ray.reduce import Reducer
    import pytest as _pytest
    p2 = TransformPipeline(sch).add(Reducer(["s"], [["x", "Sum", "sx"]]))
    with _pytest.raises(ValueError):
        IncrementalTransformer(p2)


def test_analysis_html_report(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.analysis import write_analysis_html
    t = pa.table({"x": [1.0, 2.0, 3.0, 10.0], "s": ["a", "bb", "", None]})
    p = write_analysis_html(rd.from_arrow(t), str(tmp_path / "report.html"),
                            histogram_columns=["x"])
    html = open(p).read()
    assert "<svg" in html and "count_missing" in html and "mean_length" in html


def test_csv_regex_and_sliding_window(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import add_sliding_window, read_csv_regex
    p = tmp_path / "cells.csv"
    p.write_text("[1],[a]\n[2],[b]\n")
    out = dataset_to_table(read_csv_regex(
        str(p), r"\[(.*)\]", ["num", "letter"])).sort_by("num")
    assert out["num"].to_pylist() == ["1", "2"]
    assert out["letter"].to_pylist() == ["a", "b"]
    ds = rd.from_items([{"x": i} for i in range(4)])
    win = dataset_to_table(add_sliding_window(ds, 2)).sort_by(
        [("__win_id", "ascending"), ("__win_pos", "ascending")])
    # windows: 0:[0], 1:[0,1], 2:[1,2], 3:[2,3] -> 7 rows
    assert win.num_rows == 7
    w1 = win.filter(pa.compute.equal(win["__win_id"], 1))
    assert sorted(w1["x"].to_pylist()) == [0, 1]


def test_matlab_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_matlab, write_matlab
    t = pa.table({"a": [1.0, 2.5], "b": [3.0, -4.0]})
    outdir = str(tmp_path / "mat")
    write_matlab(rd.from_arrow(t), outdir)
    back = dataset_to_table(read_matlab(outdir))
    assert sorted(back["f0"].to_pylist()) == [1.0, 2.5]
    assert sorted(back["f1"].to_pylist()) == [-4.0, 3.0]


def test_orc_roundtrip_and_column_prune(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_orc, write_orc
    t = pa.table({"a": list(range(100)),
                  "b": [f"s{i}" for i in range(100)],
                  "c": np.linspace(0.0, 1.0, 100)})
    manifest = write_orc(rd.from_arrow(t), str(tmp_path / "orc"))
    assert sum(m["rows"][0].as_py() for m in manifest) == 100
    back = dataset_to_table(read_orc(str(tmp_path / "orc"))).sort_by("a")
    assert back.equals(t)
    pruned = dataset_to_table(
        read_orc(str(tmp_path / "orc"), columns=["a"]))
    assert pruned.column_names == ["a"] and pruned.num_rows == 100


def test_arrow_ipc_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.sources import read_arrow_ipc, write_arrow_ipc
    t = pa.table({"k": ["a", "b", "c", "d"],
                  "v": pa.array([1, None, 3, 4], pa.int64()),
                  "e": [[1.0, 2.0], [], None, [5.0]]})
    write_arrow_ipc(rd.from_arrow(t), str(tmp_path / "ipc"))
    back = dataset_to_table(
        read_arrow_ipc(str(tmp_path / "ipc"))).sort_by("k")
    assert back.equals(t)
    pruned = dataset_to_table(
        read_arrow_ipc(str(tmp_path / "ipc"), columns=["v"]))
    assert pruned.column_names == ["v"]


def test_write_jdbc_roundtrip_and_idempotence(ray_session, tmp_path):
    """write_jdbc upserts on the PK: re-running the same write (a crash
    retry) converges to the same table state; read_jdbc round-trips."""
    import functools
    import sqlite3

    import ray.data as rd

    from datavec_ray.sources import read_jdbc, write_jdbc

    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("create table kv (k integer primary key, v text)")
    factory = functools.partial(sqlite3.connect, db, 30.0)

    t = pa.table({"k": pa.array(range(100), pa.int64()),
                  "v": [f"v{i}" for i in range(100)]})
    ds = rd.from_arrow(t).repartition(3)
    n = write_jdbc(ds, "kv", factory, pk_cols=["k"])
    assert n == 100
    # idempotent retry: same rows again, plus an updated value
    t2 = t.set_column(1, "v", pa.array(
        [f"v{i}" if i else "UPDATED" for i in range(100)]))
    write_jdbc(rd.from_arrow(t2), "kv", factory, pk_cols=["k"])
    back = dataset_to_table(
        read_jdbc("select k, v from kv", factory)).sort_by("k")
    assert back.num_rows == 100
    assert back["v"][0].as_py() == "UPDATED"
    assert back["v"][5].as_py() == "v5"
