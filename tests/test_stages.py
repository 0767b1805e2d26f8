"""Ray Data stage tests: codec round-trip, kernel lowering, span explode
invariants, flagship end-to-end."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from raster_functions_ray import synth, tilecodec
from raster_functions_ray.functions import pointwise as pw
from raster_functions_ray.sources import read_documents, read_tiles
from raster_functions_ray.stages import spans, tile_map


def test_codec_roundtrip():
    a = np.arange(2 * 3 * 4, dtype=np.uint16).reshape(2, 3, 4)
    buf = tilecodec.encode(a)
    b = tilecodec.decode(buf, "u2", 2, 3, 4)
    np.testing.assert_array_equal(a, b)


def test_tiles_parquet_decodes(synth_sf001):
    t = pq.read_table(f"{synth_sf001}/tiles.parquet")
    row = t.slice(0, 1).to_pylist()[0]
    pix = tilecodec.decode(row["pixels"], row["pixel_type"], row["band_count"],
                           row["height"], row["width"])
    assert pix.shape[-2:] == (row["height"], row["width"])
    m = tilecodec.decode_mask(row["mask"], row["height"], row["width"])
    assert m.mean() > 0.9  # ~3% holes


def test_apply_kernel_matches_oracle(synth_sf001):
    ds = read_tiles(synth_sf001, bands=2)
    out = tile_map.apply_kernel(ds, lambda p, m, meta: (pw.ndvi(p[0], p[1], "Raw"), m),
                                out_pixel_type="f4")
    got = {r["tile_id"]: r for r in out.take_all()}
    # single-process oracle over the raw parquet
    t = pq.read_table(f"{synth_sf001}/tiles.parquet")
    t = t.filter(np.asarray(t["band_count"]) == 2)
    checked = 0
    for row in t.slice(0, 5).to_pylist():
        pix = tilecodec.decode(row["pixels"], row["pixel_type"], row["band_count"],
                               row["height"], row["width"])
        exp = pw.ndvi(pix[0], pix[1], "Raw").astype(np.float32)
        g = got[row["tile_id"]]
        gp = tilecodec.decode(g["pixels"], g["pixel_type"], g["band_count"], g["height"], g["width"])
        np.testing.assert_array_equal(gp, exp)
        checked += 1
    assert checked == 5
    assert all(r["pixel_type"] == "f4" and r["band_count"] == 1 for r in got.values())


def test_explode_preserves_span_sequence(synth_sf001):
    docs = read_documents(synth_sf001)
    raw = pq.read_table(f"{synth_sf001}/documents.parquet")
    exploded = spans.explode_spans(docs)
    tbl = exploded.to_pandas()
    # round-trip: regroup and compare the full sequence per doc
    back = spans.reassemble_spans(
        __import__("pyarrow").Table.from_pandas(tbl, preserve_index=False))
    orig_sig = {d: s for d, s in zip(
        raw["doc_id"].to_pylist(),
        spans.span_signature(raw)["signature"].to_pylist())}
    back_sig = {d: s for d, s in zip(
        back["doc_id"].to_pylist(),
        spans.span_signature(back)["signature"].to_pylist())}
    assert orig_sig == back_sig
    # span_idx ordering matches offset ordering (offsets strictly increasing)
    g = tbl.sort_values(["doc_id", "span_idx"]).groupby("doc_id")["offset"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()


def test_tile_stats_masked(synth_sf001):
    ds = read_tiles(synth_sf001).filter(expr="tile_id == 't000_000_000'")
    st = tile_map.tile_stats(ds).take_all()
    assert len(st) == 1
    row = pq.read_table(f"{synth_sf001}/tiles.parquet").slice(0, 1).to_pylist()[0]
    pix = tilecodec.decode(row["pixels"], row["pixel_type"], row["band_count"], row["height"], row["width"])
    m = tilecodec.decode_mask(row["mask"], row["height"], row["width"]).astype(bool)
    b0 = pix if pix.ndim == 2 else pix[0]
    assert st[0]["mean"] == pytest.approx(float(b0[m].astype(np.float64).mean()))
    assert st[0]["valid_px"] == int(m.sum())


def test_flagship_runs(synth_sf001):
    from raster_functions_ray.pipelines import flagship
    out = flagship.run("/root/testdata/sf0.001").to_pandas()
    assert len(out) >= 1
    assert {"cell_id", "n_tiles", "mean_ndvi", "doc_refs"} <= set(out.columns)
    assert out["doc_refs"].sum() > 0
