"""Multi-format source round-trips (sources/tabular.py): the same events
aggregate must be format-invariant across parquet / CSV / JSONL, and
write_table must produce re-readable partitioned output."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from serverless_covariate_drift_detection_ray.sources.tabular import (
    read_table,
    write_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def text_copies(tmp_path_factory):
    """The sf0.001 events table re-landed as CSV and JSONL under /tmp,
    timestamps as ISO-8601 strings (the wire form text formats carry)."""
    root = tmp_path_factory.mktemp("events_text")
    tbl = pq.read_table(f"{SF}/events.parquet")
    # arrow strftime's %S includes the fractional seconds already
    iso = pa.compute.strftime(tbl["ts"], format="%Y-%m-%dT%H:%M:%S")
    txt = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", iso)
    import pyarrow.csv as pcsv

    pcsv.write_csv(txt, os.path.join(root, "events.csv"))
    txt.to_pandas().to_json(os.path.join(root, "events.jsonl"),
                            orient="records", lines=True,
                            date_format="iso")
    return str(root), tbl.schema


def _agg(ds):
    from ray.data.aggregate import Count, Sum

    out = (ds.groupby("event_type")
           .aggregate(Count(alias_name="n"), Sum("value", alias_name="sv"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    out["sv"] = out["sv"].round(6)
    return out


def test_csv_jsonl_match_parquet(ray_session, text_copies):
    root, schema = text_copies
    want = _agg(read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value", "ts"]))
    got_csv = _agg(read_table(os.path.join(root, "events.csv"), "csv",
                              columns=["event_type", "value", "ts"],
                              schema=schema))
    got_jsonl = _agg(read_table(os.path.join(root, "events.jsonl"), "jsonl",
                                columns=["event_type", "value", "ts"],
                                schema=schema))
    assert want.equals(got_csv)
    assert want.equals(got_jsonl)


def test_timestamp_normalization(ray_session, text_copies):
    root, schema = text_copies
    ds = read_table(os.path.join(root, "events.csv"), "csv",
                    columns=["ts", "event_id"], schema=schema)
    t = ds.take_batch(5, batch_format="pyarrow")
    assert pa.types.is_timestamp(t["ts"].type)
    orig = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    odf = orig.to_pandas().set_index("event_id")["ts"]
    tdf = t.to_pandas().set_index("event_id")["ts"]
    assert (odf.loc[tdf.index] == tdf).all()


def test_write_roundtrip(ray_session, tmp_path):
    src = read_table(f"{SF}/events.parquet",
                     columns=["event_id", "event_type", "value"])
    out = str(tmp_path / "out_parquet")
    write_table(src, out, "parquet")
    files = os.listdir(out)
    assert files and all(f.endswith(".parquet") for f in files)
    back = read_table(out)
    assert back.count() == src.count()

    with pytest.raises(ValueError):
        write_table(src, str(tmp_path / "x"), "orc")
