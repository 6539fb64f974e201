"""K5 PNG visualization sink: pure-NumPy rendering round-trips through the
engine's own PNG codec; the distributed sink writes one decodable file per
row and resumes by skipping existing files."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from audio_feature_extraction_ray.functions.codecs import _decode_png
from audio_feature_extraction_ray.stages.viz import (
    render_feature_panel,
    render_heatmap,
    render_line_strip,
    write_feature_pngs,
)


def test_render_heatmap_shape_and_range():
    mat = np.arange(12, dtype=np.float64).reshape(3, 4)
    px = render_heatmap(mat, scale=2)
    assert px.shape == (6, 8, 3) and px.dtype == np.uint8
    # min maps to the dark end, max to the bright end of the LUT
    assert px[0, 0, 2] > px[0, 0, 0]  # viridis low: blue-ish
    assert px[-1, -1, 0] > 200 and px[-1, -1, 2] < 100  # viridis high: yellow
    # constant matrix: mid-scale, no NaN blowup
    flat = render_heatmap(np.ones((2, 2)))
    assert (flat == flat[0, 0]).all()  # every pixel the same mid-scale color
    # NaNs render black
    m = np.array([[np.nan, 1.0]])
    assert (render_heatmap(m, scale=1)[0, 0] == 0).all()


def test_render_line_strip_connected():
    y = np.array([0.0, 1.0, 0.0, np.nan, 0.5])
    px = render_line_strip(y, height=20, width=5)
    assert px.shape == (20, 5, 3)
    # the 0->1 jump paints a full vertical span in column 1 (gapless trace)
    lit = (px[:, 1] != 16).any(axis=1)
    assert lit.sum() >= 15
    # NaN column stays background
    assert not (px[:, 3] != 16).any()


def test_panel_stacks_and_roundtrips_png():
    mat = np.random.default_rng(0).normal(size=(8, 8))
    panel = render_feature_panel(mat, [np.sin(np.linspace(0, 6, 100))], width=128)
    assert panel.shape[1] == 128 and panel.dtype == np.uint8
    from audio_feature_extraction_ray.functions.codecs import _encode_png

    back = _decode_png(_encode_png(panel))
    np.testing.assert_array_equal(back, panel)


def test_write_feature_pngs_and_resume(tmp_path):
    rng = np.random.default_rng(1)
    n = 12
    t = pa.table(
        {
            "image_id": pa.array([f"img{i:03d}" for i in range(n)], pa.string()),
            "embedding": pa.array([rng.normal(size=64).tolist() for _ in range(n)],
                                  pa.list_(pa.float64())),
        }
    )
    out = str(tmp_path / "viz")
    ds = ray.data.from_arrow(t)
    m1 = write_feature_pngs(ds, out, id_col="image_id", matrix_col="embedding",
                            matrix_shape=(8, 8)).to_pandas()
    assert len(m1) == n and not m1.skipped.any()
    files = sorted(os.listdir(out))
    assert len(files) == n
    px = _decode_png(open(os.path.join(out, files[0]), "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3
    assert (m1.w > 0).all() and (m1.h > 0).all()
    # second run skips everything (task-level resume), files unchanged
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    m2 = write_feature_pngs(ds, out, id_col="image_id", matrix_col="embedding",
                            matrix_shape=(8, 8)).to_pandas()
    assert m2.skipped.all()
    assert {f: os.path.getmtime(os.path.join(out, f)) for f in files} == mtimes
    # deterministic: overwrite re-render produces byte-identical files
    m3 = write_feature_pngs(ds, out, id_col="image_id", matrix_col="embedding",
                            matrix_shape=(8, 8), overwrite=True).to_pandas()
    assert not m3.skipped.any()
    assert sorted(m3.n_bytes.tolist()) == sorted(m1.n_bytes.tolist())
