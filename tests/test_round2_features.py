"""Round-2 feature tests: REST transport, YAML serde, JDBC source,
strict StringToTime, provenance metadata, sequence-plot HTML."""

import os
import sqlite3

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.pipeline import TransformPipeline
from datavec_ray.schema import Schema
from datavec_ray.steps.math import IntegerMathOp
from datavec_ray.steps.string import ChangeCase
from datavec_ray.steps.time import StringToTime, joda_to_strptime
from datavec_ray.util import dataset_to_table


def _schema():
    return Schema([("name", pa.string()), ("x", pa.int32())])


def _pipeline_json(add: int = 5) -> str:
    return (TransformPipeline(_schema())
            .add(IntegerMathOp("x", "Add", add))
            .add(ChangeCase("name", "UPPER")).to_json())


# -- REST inference server ----------------------------------------------------

def test_rest_server_roundtrip_and_hotswap():
    from datavec_ray.serve_http import TransformClient, TransformServer
    srv = TransformServer(_pipeline_json(add=5)).start()
    try:
        cli = TransformClient(f"http://127.0.0.1:{srv.port}")
        assert cli.health()["has_pipeline"]
        out = cli.transform([{"name": "ann", "x": 1}, {"name": "bo", "x": 2}])
        assert out == [{"name": "ANN", "x": 6}, {"name": "BO", "x": 7}]
        one = cli.transform_incremental({"name": "cy", "x": 10})
        assert one == {"name": "CY", "x": 15}
        # hot swap (POST /transformprocess) changes behavior in place
        cli.set_pipeline(_pipeline_json(add=100))
        assert cli.transform_incremental({"name": "cy", "x": 10}) == \
            {"name": "CY", "x": 110}
        # GET returns the swapped pipeline
        p = TransformPipeline.from_json(cli.get_pipeline())
        assert p.steps[0].scalar == 100
    finally:
        srv.stop()


def test_rest_server_rejects_bad_input():
    import urllib.error

    from datavec_ray.serve_http import TransformClient, TransformServer
    srv = TransformServer().start()
    try:
        cli = TransformClient(f"http://127.0.0.1:{srv.port}")
        assert not cli.health()["has_pipeline"]
        with pytest.raises(urllib.error.HTTPError):
            cli.transform([{"name": "a", "x": 1}])  # 409: no pipeline
    finally:
        srv.stop()


# -- YAML serde ----------------------------------------------------------------

def test_pipeline_yaml_json_serde_matrix():
    p = TransformPipeline(_schema()).add(IntegerMathOp("x", "Multiply", 3))
    via_json = TransformPipeline.from_json(p.to_json())
    via_yaml = TransformPipeline.from_yaml(p.to_yaml())
    via_both = TransformPipeline.from_yaml(
        TransformPipeline.from_json(p.to_json()).to_yaml())
    t = pa.table({"name": ["a"], "x": pa.array([7], pa.int32())})
    expect = p.execute_table(t)
    for q in (via_json, via_yaml, via_both):
        assert q.to_dict() == p.to_dict()
        assert q.execute_table(t).equals(expect)


# -- JDBC source ----------------------------------------------------------------

def test_read_jdbc_sqlite(ray_session, tmp_path):
    from datavec_ray.sources import read_jdbc, sqlite_connection
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE items (id INTEGER, name TEXT, price REAL)")
        conn.executemany("INSERT INTO items VALUES (?, ?, ?)",
                         [(i, f"item{i}", i * 1.5) for i in range(20)])
        conn.commit()
    ds = read_jdbc("SELECT id, name, price FROM items WHERE id < 10",
                   sqlite_connection(db))
    out = dataset_to_table(ds).sort_by("id")
    assert out.num_rows == 10
    assert out["name"][3].as_py() == "item3"
    assert out["price"][4].as_py() == 6.0


# -- strict StringToTime ----------------------------------------------------------

def test_joda_pattern_coverage():
    assert joda_to_strptime("YYYY-MM-dd HH:mm:ss") == "%Y-%m-%d %H:%M:%S"
    assert joda_to_strptime("dd MMM yyyy") == "%d %b %Y"
    assert joda_to_strptime("EEEE, MMMM d h:mm a") == "%A, %B %d %I:%M %p"
    assert joda_to_strptime("yy/MM/dd") == "%y/%m/%d"
    assert joda_to_strptime("'at' HH:mm") == "at %H:%M"
    with pytest.raises(ValueError, match="unsupported Joda token"):
        joda_to_strptime("GGGG yyyy")      # era
    with pytest.raises(ValueError, match="unsupported Joda token"):
        joda_to_strptime("xxxx-'W'ww-e")   # weekyear


def test_string_to_time_strict_build():
    with pytest.raises(ValueError):
        StringToTime("ts", fmt="yyyy 'W'ww")  # fails at BUILD, not runtime
    step = StringToTime("ts", fmt="dd MMM yyyy HH:mm")
    t = pa.table({"ts": ["03 Feb 2021 07:30", "15 Aug 1999 23:05"]})
    out = step.apply(t)
    assert out["ts"].to_pylist()[0].isoformat() == "2021-02-03T07:30:00"
    assert out["ts"].to_pylist()[1].isoformat() == "1999-08-15T23:05:00"


# -- provenance metadata -------------------------------------------------------

def test_lines_provenance_and_load_from_metadata(ray_session, tmp_path):
    from datavec_ray.sources import (load_lines_from_metadata,
                                     read_lines_with_provenance)
    f1, f2 = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    with open(f1, "w") as f:
        f.write("alpha\nbeta\ngamma\n")
    with open(f2, "w") as f:
        f.write("uno\ndos\n")
    out = dataset_to_table(read_lines_with_provenance([f1, f2])) \
        .sort_by([("__source_file", "ascending"), ("__row_idx", "ascending")])
    assert out["line"].to_pylist() == ["alpha", "beta", "gamma", "uno", "dos"]
    assert out["__row_idx"].to_pylist() == [0, 1, 2, 0, 1]
    # random re-read by metadata, preserving request order
    back = load_lines_from_metadata([(f2, 1), (f1, 0)])
    assert back["line"].to_pylist() == ["dos", "alpha"]


# -- sequence plot HTML ---------------------------------------------------------

def test_sequence_plot_html(tmp_path):
    from datavec_ray.analysis import write_sequence_plot_html
    t = pa.table({
        "conv": ["a"] * 5 + ["b"] * 3,
        "step": list(range(5)) + list(range(3)),
        "val": [1.0, 2.0, 1.5, 3.0, 2.5, 10.0, 9.0, 11.0],
    })
    path = write_sequence_plot_html(t, str(tmp_path / "seq.html"),
                                    "conv", "step", ["val"])
    html = open(path).read()
    assert "<svg" in html and "polyline" in html
    assert html.count("<div class='chart'>") == 2  # one per sequence


# -- GeoIP range-db resolver ----------------------------------------------------

def test_geoip_csv_range_db(ray_session, tmp_path):
    import ray.data as rd
    from datavec_ray.ops.geo import GeoIPLookup, ipv4_to_uint32
    # vectorized IPv4 parse
    ips = pa.array(["1.2.3.4", "255.255.255.255", "0.0.0.1", "bad", None])
    vals = ipv4_to_uint32(ips)
    assert vals.tolist() == [(1 << 24) + (2 << 16) + (3 << 8) + 4,
                             (1 << 32) - 1, 1, 0, 0]
    db = str(tmp_path / "ranges.csv")
    with open(db, "w") as f:
        f.write("ip_lo,ip_hi,lat,lon\n")
        f.write("10.0.0.0,10.0.0.255,48.85,2.35\n")        # paris block
        f.write("192.168.1.0,192.168.1.255,40.71,-74.0\n")  # nyc block
    t = pa.table({"ip": ["10.0.0.7", "192.168.1.200", "8.8.8.8"]})
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        GeoIPLookup("ip", "coords", db_path=db), batch_format="pyarrow",
        concurrency=2))
    coords = dict(zip(out["ip"].to_pylist(), out["coords"].to_pylist()))
    assert coords["10.0.0.7"].startswith("48.85")
    assert coords["192.168.1.200"].startswith("40.71")
    assert coords["8.8.8.8"] is None  # outside every range


# -- object detection records ----------------------------------------------------

def test_object_detection_records(ray_session):
    import ray.data as rd
    from datavec_ray.ops.codecs import encode_png
    from datavec_ray.ops.multimodal import (MEDIA_SCHEMA,
                                            object_detection_records)
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_png(img)] * 2, pa.binary()),
        "media_type": pa.array(["image", "image"]),
        "width": pa.array([8, 8], pa.int32()),
        "height": pa.array([8, 8], pa.int32()),
        "sample_rate": pa.array([0, 0], pa.int32()),
        "duration_ms": pa.array([0, 0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    boxes = pa.table({
        "media_id": pa.array([0, 0, 1], pa.int64()),
        "xmin": pa.array([0.0, 2.0, 1.0], pa.float32()),
        "ymin": pa.array([0.0, 2.0, 1.0], pa.float32()),
        "xmax": pa.array([4.0, 6.0, 7.0], pa.float32()),
        "ymax": pa.array([4.0, 6.0, 7.0], pa.float32()),
        "label": pa.array(["cat", "dog", "cat"]),
    })
    out = dataset_to_table(object_detection_records(
        rd.from_arrow(t), boxes, target_h=4, target_w=4)).sort_by("media_id")
    assert out.column_names == ["media_id", "image_feat", "boxes"]
    b0 = out["boxes"][0].as_py()
    assert len(b0) == 2 and {x["label"] for x in b0} == {"cat", "dog"}
    assert len(out["boxes"][1].as_py()) == 1
    # decoded uniform gray image → every feature = 128/255
    feat = np.array(out["image_feat"][0].as_py())
    assert np.allclose(feat, 128 / 255.0, atol=1e-6)


# -- /transformarray -------------------------------------------------------------

def test_rest_transform_array():
    from datavec_ray.serve_http import TransformClient, TransformServer
    srv = TransformServer(_pipeline_json(add=5)).start()
    try:
        cli = TransformClient(f"http://127.0.0.1:{srv.port}")
        mat, cols = cli.transform_array([{"name": "a", "x": 1},
                                         {"name": "b", "x": 2}])
        assert cols == ["x"]
        assert mat.shape == (2, 1)
        assert mat.ravel().tolist() == [6.0, 7.0]
    finally:
        srv.stop()


# -- Y4M video decode ------------------------------------------------------------

def test_y4m_roundtrip_and_frame_sample(ray_session):
    import ray.data as rd
    from datavec_ray.ops.codecs import decode_y4m, encode_y4m
    from datavec_ray.ops.multimodal import MEDIA_SCHEMA, VideoFrameSample
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (6, 10, 12), dtype=np.uint8)
    data = encode_y4m(frames, fps=10)
    back, fps = decode_y4m(data)
    assert fps == 10
    assert np.array_equal(back, frames)
    # real frame sampling: constant-luma frames → exact feature values
    const = np.stack([np.full((8, 8), v, np.uint8) for v in (0, 85, 170, 255)])
    t = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([encode_y4m(const)], pa.binary()),
        "media_type": pa.array(["video"]),
        "width": pa.array([8], pa.int32()),
        "height": pa.array([8], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
        "duration_ms": pa.array([400], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        VideoFrameSample(n_frames=4, feat=16, deterministic_fake=False),
        batch_format="pyarrow")).sort_by("frame_idx")
    assert out.num_rows == 4
    for i, v in enumerate((0, 85, 170, 255)):
        feat = np.array(out["frame_feat"][i].as_py())
        assert np.allclose(feat, v / 255.0, atol=1e-6)
