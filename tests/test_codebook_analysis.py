"""Codebook analytics tests — tracker math + the full figure inventory of
the reference's analyze_codebooks (codebook_analysis.py:115-400): usage
histograms, 6-panel combo usage/frequency maps, categorical and
frequency-colored composed-vector 3-D scatters, vector heatmaps."""
import os

import numpy as np

from flocoder_tpu.ops.rvq import rvq_init
from flocoder_tpu.utils.codebook_analysis import (
    CodebookUsageTracker, analyze_codebooks, plot_combo_usage_map,
    plot_zq_3d_frequency_scatter, plot_zq_3d_scatter)

import jax


def _tracker(K=8, L=3):
    t = CodebookUsageTracker(num_levels=L, codebook_size=K)
    rng = np.random.default_rng(0)
    t.update_counts("train", rng.integers(0, K, (64, L)))
    t.update_counts("val", rng.integers(0, K // 2, (32, L)))
    return t


def test_pair_combo_matrix_decomposes_keys():
    K, L = 4, 3
    t = CodebookUsageTracker(num_levels=L, codebook_size=K)
    # one sample with codes (1, 2, 3) → pair (1, 2) counted once
    t.update_counts("train", np.array([[1, 2, 3], [1, 2, 0]]))
    mat = t.pair_combo_matrix("train")
    assert mat[1, 2] == 2
    assert mat.sum() == 2


def test_combo_map_and_scatters_render(tmp_path):
    t = _tracker()
    vq = rvq_init(jax.random.PRNGKey(0), 3, 8, 4)
    p1 = plot_combo_usage_map(t, epoch=1, output_dir=str(tmp_path),
                              use_wandb=False)
    p2 = plot_zq_3d_scatter(t, vq, epoch=1, output_dir=str(tmp_path),
                            use_wandb=False)
    p3 = plot_zq_3d_frequency_scatter(t, vq, "train", epoch=1,
                                      output_dir=str(tmp_path),
                                      use_wandb=False)
    for p in (p1, p2, p3):
        assert p is not None and os.path.exists(p) and os.path.getsize(p) > 0


def test_analyze_produces_full_figure_inventory(tmp_path):
    t = _tracker()
    vq = rvq_init(jax.random.PRNGKey(0), 3, 8, 4)
    metrics = analyze_codebooks(t, vq, epoch=2, use_wandb=False,
                                output_dir=str(tmp_path))
    assert "train_usage_pct_level0" in metrics
    assert "val_only_codes" in metrics
    files = os.listdir(tmp_path)
    for stem in ("codebook_usage_epoch2", "codebook_combos_epoch2",
                 "codebook_vectors_epoch2", "zq_3d_scatter_epoch2",
                 "zq_3d_freq_train_log_epoch2", "zq_3d_freq_val_log_epoch2"):
        assert any(f.startswith(stem) for f in files), (stem, files)


def test_combo_map_needs_two_datasets(tmp_path):
    t = CodebookUsageTracker(num_levels=2, codebook_size=4)
    t.update_counts("train", np.zeros((4, 2), int))
    assert plot_combo_usage_map(t, 0, str(tmp_path), False) is None


def test_scatter_skips_low_dim_embeddings(tmp_path):
    t = _tracker()
    vq = rvq_init(jax.random.PRNGKey(0), 3, 8, 2)  # D=2 < 3
    assert plot_zq_3d_scatter(t, vq, 0, str(tmp_path), False) is None


def test_interactive_html_twins_written(tmp_path):
    """The dependency-free interactive .html twin (reference plotly-widget
    parity, utils/interactive_scatter.py) is written next to each static
    3-D scatter PNG and embeds the point data + canvas renderer."""
    t = _tracker()
    vq = rvq_init(jax.random.PRNGKey(0), 3, 8, 4)
    plot_zq_3d_scatter(t, vq, epoch=3, output_dir=str(tmp_path),
                       use_wandb=False)
    plot_zq_3d_frequency_scatter(t, vq, "train", epoch=3,
                                 output_dir=str(tmp_path), use_wandb=False)
    cat = os.path.join(str(tmp_path), "zq_3d_scatter_epoch3.html")
    freq = os.path.join(str(tmp_path), "zq_3d_freq_train_log_epoch3.html")
    for p in (cat, freq):
        assert os.path.exists(p), p
        html = open(p).read()
        assert "<canvas" in html and "DATA=" in html and "pts" in html
        assert "http" not in html.split("<script>")[1]  # self-contained
    assert '"vals"' in open(freq).read()  # frequency coloring embedded


def test_export_scatter3d_html_empty_returns_none(tmp_path):
    from flocoder_tpu.utils.interactive_scatter import export_scatter3d_html
    out = export_scatter3d_html(
        os.path.join(str(tmp_path), "x.html"),
        [{"name": "empty", "points": np.zeros((0, 3))}])
    assert out is None
