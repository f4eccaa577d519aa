"""Detection correctness anchors: footprints, peaks, min-separation
culling, quadtree dedup, and cross-scale structures on scenes with KNOWN
answers.

The reference ships no unit tests for its detection kernels; these anchor
the semantics of scarlet/detect_pybind11.cc:104-280 and detect.py:115-384
on constructed scenes so "matches the reference" is checkable.
"""
import numpy as np
import pytest

import scarlet_tpu as st
from scarlet_tpu.bbox import Box
from scarlet_tpu.detect import (
    Footprint,
    Peak,
    QuadTreeRegion,
    SingleScaleStructure,
    bounds_to_bbox,
    box_intersect,
    footprint_intersect,
    get_blend_structures,
    get_blend_trees,
    get_connected_pixels,
    get_footprints,
    get_peaks,
)


def gaussian_bump(H, W, cy, cx, sigma, amp):
    yy, xx = np.mgrid[0:H, 0:W]
    return amp * np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / sigma ** 2)


class TestConnectedPixels:
    def test_connected_region_and_bounds(self):
        """4-connected flood fill from a seed pixel
        (ref detect_pybind11.cc:17-59)."""
        img = np.zeros((8, 8))
        img[2:5, 2:4] = 1.0       # one blob
        img[6, 6] = 1.0           # separate blob
        # diagonal-only touch is NOT connected under 4-connectivity
        img[5, 4] = 1.0
        fp, bounds = get_connected_pixels(3, 2, img, thresh=0)
        assert fp[2:5, 2:4].all()
        assert not fp[6, 6]
        assert not fp[5, 4]
        assert bounds.tolist() == [2, 4, 2, 3]

    def test_seed_below_threshold(self):
        img = np.zeros((5, 5))
        img[1, 1] = 1.0
        fp, bounds = get_connected_pixels(3, 3, img, thresh=0)
        assert not fp.any()
        assert bounds.tolist() == [3, 3, 3, 3]


class TestFootprintsAndPeaks:
    def test_known_peaks_found_exactly(self):
        """Well-separated bumps -> one footprint each, peak at the planted
        pixel; two merged bumps -> one footprint with both peaks
        (ref detect_pybind11.cc:241-280)."""
        H = W = 64
        img = (gaussian_bump(H, W, 12, 14, 1.5, 10.0)
               + gaussian_bump(H, W, 40, 45, 1.5, 6.0)
               # overlapping pair: one connected footprint, two maxima
               + gaussian_bump(H, W, 50, 12, 1.8, 8.0)
               + gaussian_bump(H, W, 50, 20, 1.8, 7.0))
        fps = get_footprints(img, min_separation=0, min_area=4, thresh=0.05)
        peak_sets = [sorted((p.y, p.x) for p in fp.peaks) for fp in fps]
        all_peaks = sorted(p for s in peak_sets for p in s)
        assert all_peaks == [(12, 14), (40, 45), (50, 12), (50, 20)]
        # the overlapping pair shares one footprint
        pair = [s for s in peak_sets if len(s) == 2]
        assert pair == [[(50, 12), (50, 20)]]
        # peaks within a footprint are brightness-ordered
        for fp in fps:
            fluxes = [p.flux for p in fp.peaks]
            assert fluxes == sorted(fluxes, reverse=True)

    def test_min_separation_keeps_brighter(self):
        """Two maxima closer than min_separation: the brighter wins
        (ref detect_pybind11.cc:104-195 brightness-sorted culling)."""
        H = W = 32
        img = (gaussian_bump(H, W, 15, 12, 1.2, 5.0)
               + gaussian_bump(H, W, 15, 16, 1.2, 9.0))
        no_cull = get_footprints(img, min_separation=0, min_area=4,
                                 thresh=0.05)
        assert sorted((p.y, p.x) for fp in no_cull for p in fp.peaks) == \
            [(15, 12), (15, 16)]
        culled = get_footprints(img, min_separation=5, min_area=4,
                                thresh=0.05)
        peaks = [p for fp in culled for p in fp.peaks]
        assert [(p.y, p.x) for p in peaks] == [(15, 16)]

    def test_min_area_filter(self):
        img = np.zeros((16, 16))
        img[2, 2] = 1.0                  # 1-pixel blob: dropped (area <= 4)
        img[8:11, 8:11] = 1.0            # 9-pixel blob: kept
        fps = get_footprints(img, min_separation=0, min_area=4, thresh=0)
        assert len(fps) == 1
        assert bounds_to_bbox(fps[0].bounds) == Box((3, 3), origin=(8, 8))


class TestQuadTree:
    def test_query_returns_exactly_intersecting_boxes(self):
        tree = QuadTreeRegion(Box((100, 100)), capacity=5)
        boxes = [Box((10, 10), origin=(10 * i, 10 * i)) for i in range(9)]
        for b in boxes:
            tree.add(b)
        hits = tree.query(Box((15, 15), origin=(18, 18)))
        assert hits == {boxes[1], boxes[2], boxes[3]}
        # whole-domain query returns every box exactly once (set dedup
        # across quadrants, ref detect.py:232-254)
        assert tree.query() == set(boxes)

    def test_split_dedup_on_straddling_box(self):
        """A box straddling the split point lands in several sub-regions
        but queries return it once."""
        tree = QuadTreeRegion(Box((64, 64)), capacity=2)
        straddler = Box((20, 20), origin=(22, 22))   # crosses (32, 32)
        others = [Box((4, 4), origin=(2 + 6 * i, 2)) for i in range(6)]
        for b in [straddler] + others:
            tree.add(b)
        assert tree.sub_regions is not None          # capacity forced split
        hits = tree.query(Box((64, 64)))
        assert straddler in hits
        assert len(hits) == 7

    def test_add_footprints_and_peak_iter(self):
        fp_mask = np.ones((4, 4), bool)
        fp = Footprint(fp_mask, [Peak(5, 6, 2.0)],
                       np.array([4, 7, 4, 7], np.int32))
        tree = QuadTreeRegion(Box((32, 32)), capacity=5).add_footprints([fp])
        peaks = list(tree.peaks)
        assert [(p.y, p.x, p.flux) for p in peaks] == [(5, 6, 2.0)]


class TestFootprintIntersect:
    def test_mask_level_intersection(self):
        """Boxes overlap but masks only sometimes do
        (ref detect.py:46-65)."""
        m1 = np.zeros((6, 6), bool)
        m1[:3, :3] = True
        b1 = Box((6, 6), origin=(0, 0))
        m2 = np.zeros((6, 6), bool)
        m2[3:, 3:] = True
        b2 = Box((6, 6), origin=(2, 2))
        assert box_intersect(b1, b2)
        # m1's support is (0:3, 0:3); m2's is (5:8, 5:8) in scene coords
        assert not footprint_intersect(m1, b1, m2, b2)
        m2[:2, :2] = True                 # support now at (2:4, 2:4): overlap
        assert footprint_intersect(m1, b1, m2, b2)
        assert not box_intersect(b1, Box((3, 3), origin=(20, 20)))


class TestStructures:
    def test_cross_scale_peak_merge(self):
        """SingleScaleStructure merges peaks from overlapping footprints at
        other scales, deduplicated by (x, y) (ref detect.py:300-384)."""
        big = Footprint(np.ones((10, 10), bool), [Peak(5, 5, 3.0)],
                        np.array([0, 9, 0, 9], np.int32))
        s = SingleScaleStructure(2, big)
        inside = Footprint(np.ones((3, 3), bool),
                           [Peak(5, 5, 1.0), Peak(6, 6, 0.5)],
                           np.array([4, 6, 4, 6], np.int32))
        outside = Footprint(np.ones((3, 3), bool), [Peak(20, 20, 9.0)],
                            np.array([19, 21, 19, 21], np.int32))
        tree = QuadTreeRegion(Box((32, 32)), capacity=5)
        tree.add_footprints([inside, outside])
        s.add_scale_tree(0, tree)
        assert set(s.peaks.keys()) == {2, 0}
        # (5,5) dedups across scales; (20,20) excluded (no overlap)
        assert s.all_peaks == {(5, 5), (6, 6)}

    def test_blend_trees_and_structures_shapes(self):
        """get_blend_trees (ref detect.py:443-466) builds one quadtree per
        non-residual scale; get_blend_structures links 3rd-scale footprints
        to lower scales."""
        H = W = 64
        img = (gaussian_bump(H, W, 20, 20, 2.5, 20.0)
               + gaussian_bump(H, W, 24, 26, 2.0, 12.0))
        detect = np.asarray(st.ops.wavelet.starlet_transform(img, scales=3))
        trees, all_fps = get_blend_trees(detect)
        assert len(trees) == len(all_fps) == detect.shape[0] - 1
        for tree, fps in zip(trees, all_fps):
            assert tree.query() == set() or len(tree.query()) == len(fps)

        structures, middle_tree = get_blend_structures(detect)
        assert len(structures) >= 1
        # every structure's peaks include its own scale-2 footprint peaks
        for struct in structures:
            own = {(p.x, p.y) for p in struct.footprint.peaks}
            assert own <= struct.all_peaks


class TestGetPeaksPipeline:
    def test_planted_sources_recovered(self):
        """Full wavelet detection pipeline on a noisy scene with planted
        sources: every planted position is recovered within 1 px and no
        spurious peak appears (ref detect.py:517-572)."""
        rng = np.random.default_rng(7)
        H = W = 64
        planted = [(16, 20), (40, 44), (46, 14)]
        scene = np.zeros((H, W))
        for (cy, cx), amp in zip(planted, (30.0, 22.0, 18.0)):
            scene += gaussian_bump(H, W, cy, cx, 1.8, amp)
        sigma = 0.1
        images = np.stack([
            scene * f + rng.normal(scale=sigma, size=(H, W))
            for f in (0.8, 1.0, 1.2)
        ])
        variance = np.full_like(images, sigma ** 2)

        peaks = get_peaks(images=images, variance=variance)
        assert len(peaks) == len(planted)
        matched = set()
        for (py, px) in peaks:
            hits = [i for i, (cy, cx) in enumerate(planted)
                    if abs(py - cy) <= 1 and abs(px - cx) <= 1]
            assert hits, f"spurious peak at {(py, px)}"
            matched.update(hits)
        assert matched == {0, 1, 2}
