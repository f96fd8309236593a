"""Unit tests for the from-scratch polygon boolean-area kernel
(core/overlay.py) and the concave overlay / dissolve stages built on it.

The kernel replaces the reference's JTS delegation
(VectorTools/src/plugins/Clip.java:455, Intersect/Union/Difference/
SymmetricDifference.java:215-244, Scripts/Dissolve.groovy:202).
"""

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_ray.core.overlay import (
    _OPS, boolean_area, union_area_many)


def box(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


def box_inter(a, b):
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(w, 0.0) * max(h, 0.0)


def box_area(a):
    return (a[2] - a[0]) * (a[3] - a[1])


def test_disjoint_and_identical_squares():
    a, b = box(0, 0, 2, 2), box(5, 5, 7, 7)
    assert boolean_area([a], [b], "intersection") == 0.0
    assert boolean_area([a], [b], "union") == pytest.approx(8.0)
    assert boolean_area([a], [a], "intersection") == pytest.approx(4.0)
    assert boolean_area([a], [a], "symmetric_difference") == pytest.approx(0.0)
    assert boolean_area([a], [a], "difference") == pytest.approx(0.0)


def test_partial_overlap_squares():
    a, b = box(0, 0, 2, 2), box(1, 1, 3, 3)
    assert boolean_area([a], [b], "intersection") == pytest.approx(1.0)
    assert boolean_area([a], [b], "union") == pytest.approx(7.0)
    assert boolean_area([a], [b], "difference") == pytest.approx(3.0)
    assert boolean_area([a], [b], "symmetric_difference") == pytest.approx(6.0)


def test_hole_even_odd():
    # A = square with a centred hole (even-odd: inner ring = hole)
    shell, hole = box(0, 0, 4, 4), box(1, 1, 3, 3)
    b = box(0, 0, 4, 4)
    assert boolean_area([shell, hole], [b], "intersection") == pytest.approx(12.0)
    assert boolean_area([shell, hole], [b], "difference") == pytest.approx(0.0)
    # B inside the hole: no intersection
    b2 = box(1.5, 1.5, 2.5, 2.5)
    assert boolean_area([shell, hole], [b2], "intersection") == pytest.approx(0.0)
    assert boolean_area([shell, hole], [b2], "union") == pytest.approx(13.0)


def test_non_axis_aligned_triangles():
    t1 = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    t2 = np.array([[4.0, 4.0], [0.0, 4.0], [4.0, 0.0]])  # other half-square
    assert boolean_area([t1], [t2], "intersection") == pytest.approx(0.0)
    assert boolean_area([t1], [t2], "union") == pytest.approx(16.0)
    # shifted triangle overlapping
    t3 = t1 + np.array([1.0, 1.0])
    i = boolean_area([t1], [t3], "intersection")
    u = boolean_area([t1], [t3], "union")
    assert i + u == pytest.approx(16.0)  # |A|+|B| = |A∩B|+|A∪B|
    assert i == pytest.approx(2.0)  # triangle x+y>=2 & x+y<=4 & x>=1 & y>=1


def test_concave_l_vs_l():
    # L = [0,4]x[0,2] ∪ [0,2]x[2,4]; rotate the other by swapping roles
    la = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    lb = np.array([[1, 1], [5, 1], [5, 3], [3, 3], [3, 5], [1, 5]], dtype=float)
    ra = [(0, 0, 4, 2), (0, 2, 2, 4)]
    rb = [(1, 1, 5, 3), (1, 3, 3, 5)]
    inter = sum(box_inter(p, q) for p in ra for q in rb)
    area_a = sum(box_area(p) for p in ra)
    area_b = sum(box_area(q) for q in rb)
    assert boolean_area([la], [lb], "intersection") == pytest.approx(inter)
    assert boolean_area([la], [lb], "union") == pytest.approx(
        area_a + area_b - inter)
    assert boolean_area([la], [lb], "difference") == pytest.approx(
        area_a - inter)
    assert boolean_area([la], [lb], "symmetric_difference") == pytest.approx(
        area_a + area_b - 2 * inter)


def test_shared_edge_degeneracy():
    a, b = box(0, 0, 2, 2), box(2, 0, 4, 2)  # share the x=2 edge
    assert boolean_area([a], [b], "intersection") == pytest.approx(0.0)
    assert boolean_area([a], [b], "union") == pytest.approx(8.0)
    c = box(0, 2, 2, 4)  # share the y=2 edge
    assert boolean_area([a], [c], "intersection") == pytest.approx(0.0)
    assert boolean_area([a], [c], "union") == pytest.approx(8.0)


def test_randomized_box_pairs_vs_closed_form():
    g = np.random.default_rng(7)
    for _ in range(60):
        a = np.sort(g.integers(0, 50, 2)), np.sort(g.integers(0, 50, 2))
        b = np.sort(g.integers(0, 50, 2)), np.sort(g.integers(0, 50, 2))
        ba = (a[0][0], a[1][0], a[0][1] + 1, a[1][1] + 1)
        bb = (b[0][0], b[1][0], b[0][1] + 1, b[1][1] + 1)
        ra, rb = box(*ba), box(*bb)
        inter = box_inter(ba, bb)
        for op in _OPS:
            want = {"intersection": inter,
                    "union": box_area(ba) + box_area(bb) - inter,
                    "difference": box_area(ba) - inter,
                    "symmetric_difference":
                        box_area(ba) + box_area(bb) - 2 * inter}[op]
            assert boolean_area([ra], [rb], op) == pytest.approx(want), (
                ba, bb, op)


def test_union_area_many_vs_inclusion_exclusion():
    g = np.random.default_rng(11)
    for _ in range(20):
        boxes = []
        for _ in range(g.integers(1, 7)):
            xs, ys = np.sort(g.integers(0, 30, 2)), np.sort(g.integers(0, 30, 2))
            boxes.append((xs[0], ys[0], xs[1] + 1, ys[1] + 1))
        # oracle: rasterize on the integer grid
        grid = np.zeros((32, 32), dtype=bool)
        for x0, y0, x1, y1 in boxes:
            grid[int(y0):int(y1), int(x0):int(x1)] = True
        want = float(grid.sum())
        got = union_area_many([[box(*b)] for b in boxes])
        assert got == pytest.approx(want), boxes


def test_union_area_many_rotated():
    # two unit squares rotated 45°, overlapping; compare against the
    # pairwise kernel (|A|+|B|−|A∩B|)
    sq = np.array([[1.0, 0.0], [2.0, 1.0], [1.0, 2.0], [0.0, 1.0]])
    sq2 = sq + np.array([0.7, 0.3])
    pair_union = boolean_area([sq], [sq2], "union")
    assert union_area_many([[sq], [sq2]]) == pytest.approx(pair_union)
    assert union_area_many([[sq]]) == pytest.approx(2.0)


def test_overlay_stage_matches_kernel_scalar(ray_session):
    """The distributed stage rows equal per-row kernel calls (sf0.001)."""
    from whitebox_geospatial_analysis_tools_ray.stages import vector_overlay as vo

    ls = vo.doc_lshapes("/root/testdata/sf0.001").take(50)
    out = {r["rec_id"]: r["intersection_area"]
           for r in vo.overlay_areas("/root/testdata/sf0.001", "intersection")
           .take_all()}
    for r in ls:
        want = boolean_area([vo._l_ring(r["xa"], r["ya"], r["h"], r["w2"])],
                            vo.CLIP_L_RINGS, "intersection")
        if want > 0:
            assert out[r["rec_id"]] == pytest.approx(want)
        else:
            assert r["rec_id"] not in out
