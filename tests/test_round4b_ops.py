"""Round-4 late additions: pyramid (overview build), contours, Moran's I,
OD flows — brute-force python mirrors + plan shapes."""

import pytest


def _fine_grid(spark, sf_dir, modulo=8):
    import numpy as np

    import __spark_entry__ as em
    from aira_spark.functions.cells import np_cell_ix, np_cell_iy
    from aira_spark.operators.mosaic import mosaic_cell_values

    images = em._images(spark, sf_dir, modulo=modulo)
    vals = mosaic_cell_values(images, em.CELL_RES, patch_bits=4).collect()
    filled = {}
    for r in vals:
        fx = int(np_cell_ix(np.int64(r["cell"]))) * 16 + r["pc"]
        fy = int(np_cell_iy(np.int64(r["cell"]))) * 16 + r["pr"]
        filled[(fx, fy)] = r["val"]
    return filled


# ---------------------------------------------------------------- pyramid


def test_pyramid_matches_brute_force(spark, sf_dir):
    import __spark_entry__ as em
    from aira_spark.operators.pyramid import pyramid_levels

    filled = _fine_grid(spark, sf_dir)
    got = {
        (r["level"], r["px"], r["py"]): (r["n_src"], r["sum_val"], r["mean_e6"])
        for r in pyramid_levels(
            em._images(spark, sf_dir, modulo=8), em.CELL_RES, 4, levels=3
        ).collect()
    }
    want = {}
    for (fx, fy), v in filled.items():
        for k in range(4):
            key = (k, fx >> k, fy >> k)
            n, s = want.get(key, (0, 0))
            want[key] = (n + 1, s + v)
    assert set(got) == set(want)
    for key, (n, s) in want.items():
        assert got[key] == (n, s, (s * 1_000_000) // n), key


def test_pyramid_level_zero_is_fine_grid(spark, sf_dir):
    import __spark_entry__ as em
    from aira_spark.operators.pyramid import pyramid_levels

    filled = _fine_grid(spark, sf_dir)
    lvl0 = [
        r
        for r in pyramid_levels(
            em._images(spark, sf_dir, modulo=8), em.CELL_RES, 4, levels=1
        ).collect()
        if r["level"] == 0
    ]
    assert len(lvl0) == len(filled)
    for r in lvl0:
        assert r["n_src"] == 1
        assert filled[(r["px"], r["py"])] == r["sum_val"]


def test_pyramid_single_extra_agg_no_join(spark, sf_dir):
    """The whole L-level stack is ONE scatter (Generate) + ONE hash agg on
    top of the mosaic's: 2 exchanges total, no join, no Python past the
    decode UDF."""
    import __spark_entry__ as em
    from aira_spark.operators.pyramid import pyramid_levels
    from tests.test_plans import count_in_plan, plan_string, shuffle_count

    df = pyramid_levels(em._images(spark, sf_dir, modulo=8), em.CELL_RES, 4, 3)
    s = plan_string(df)
    assert shuffle_count(df) == 2, s  # mosaic agg + pyramid agg
    assert "Join" not in s and "CartesianProduct" not in s, s
    assert "Generate" in s, s  # the level explode
    assert count_in_plan(df, "ArrowEvalPython") <= 1, s
    assert "BatchEvalPython" not in s, s
