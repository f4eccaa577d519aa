"""Regression harness at reference scale: generated blend sets, the
batched set-level deblending pipeline, metric records, and the dashboard
renderer (SURVEY.md §2 #30, reference testing/api.py + measure.py:124-231,
docs/regression.rst:4-12)."""
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scarlet_tpu import testing


@pytest.fixture(scope="module")
def small_set(tmp_path_factory):
    root = tmp_path_factory.mktemp("regression")
    paths = testing.generate_blend_set(set_id=4, n=4, seed=1004, root=root)
    return root, paths


class TestBlendSets:
    def test_generated_set_is_deterministic(self, tmp_path):
        p1 = testing.generate_blend_set(set_id=7, n=2, seed=42,
                                        root=tmp_path / "a")
        p2 = testing.generate_blend_set(set_id=7, n=2, seed=42,
                                        root=tmp_path / "b")
        for a, b in zip(p1, p2):
            da, db = np.load(a, allow_pickle=True), np.load(b,
                                                            allow_pickle=True)
            np.testing.assert_array_equal(da["images"], db["images"])

    def test_generation_is_rng_stable(self):
        """The first blend of every generated set reproduces its pinned
        checksum: the committed baselines were recorded against exactly
        these pixels, and the set cache is ephemeral — ANY change to the
        generator's rng consumption order (even a knob drawn-but-unused
        at its default) silently invalidates sets 4-7 against their
        baselines.  Regression: the set-8 realism knobs originally drew
        PSF angles and the Spergel gate unconditionally."""
        import hashlib

        from scarlet_tpu.testing.blendsets import generate_blend, \
            _SET_PARAMS

        expected = {
            4: "1236ef6cf13eecc2",
            5: "a0b9b8325b8365bf",
            6: "04a5a995a0a61703",
            7: "2417724f318b5629",
            8: "0e246726eb5f757e",
        }
        for sid, want in expected.items():
            rng = np.random.default_rng(1000 + sid)
            params = dict(_SET_PARAMS.get(sid, {}))
            n_range = params.pop("n_range", None)
            n_sources = int(rng.integers(*n_range)) if n_range else None
            blend = generate_blend(rng, n_sources=n_sources, **params)
            got = hashlib.sha256(
                np.ascontiguousarray(blend["images"]).tobytes()
            ).hexdigest()[:16]
            assert got == want, f"set {sid} generator drifted"

    def test_blend_contents(self, small_set):
        _, paths = small_set
        data = np.load(paths[0], allow_pickle=True)
        C, H, W = data["images"].shape
        assert data["variance"].shape == (C, H, W)
        assert data["psfs"].shape[0] == C
        catalog = data["catalog"]
        assert len(catalog) >= 3
        # reference truth convention: per-band full-scene intensity images
        # (psf_matched_sim.npz catalog dtype)
        for f in np.asarray(data["filters"]).tolist():
            f = f.decode() if isinstance(f, bytes) else str(f)
            assert catalog[0][f"intensity_{f}"].shape == (H, W)
        # photometric consistency: summed truth ~ image flux (PSF conserves)
        total_truth = sum(
            catalog[i]["intensity_r"].sum() for i in range(len(catalog)))
        assert total_truth > 0

    def test_full_set_sizes(self):
        """Sets 4/5 regenerate at reference-scale sizes (50/14 blends);
        set 7 is the beyond-reference crowded tier."""
        assert testing.api._GENERATED[4] == 50
        assert testing.api._GENERATED[5] == 14
        assert testing.api._GENERATED[7] == 25

    def test_crowded_set_is_crowded(self, tmp_path):
        """Set 7 blends carry 8-16 sources at >= 3 px separation."""
        paths = testing.generate_blend_set(set_id=7, n=3, seed=1007,
                                           root=tmp_path)
        for p in paths:
            cat = np.load(p, allow_pickle=True)["catalog"]
            assert 8 <= len(cat) <= 16
            pos = np.stack([cat["y"], cat["x"]], 1)
            d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
            d[np.diag_indices(len(cat))] = np.inf
            assert d.min() >= 3.0


class TestBatchedPipeline:
    def test_deblend_and_measure_lite(self, small_set):
        root, paths = small_set
        results = testing.deblend_and_measure(
            set_ids=[91], paths=paths, pipeline="lite", root=root,
            branch="test", max_iter=30)
        records = results[91]
        assert len(records) == len(paths)
        for rec in records:
            assert np.isfinite(rec["logL"])
            assert rec["logL"] > rec["init logL"]
            assert 1 <= rec["iterations"] <= 30
            assert rec["n_sources"] >= 1
            # per-band magnitude errors vs the truth catalog
            diffs = [s for s in rec["sources"] if "r diff" in s]
            assert diffs, "no truth-matched sources measured"
            pos = [s["pos diff"] for s in rec["sources"] if "pos diff" in s]
            assert pos and np.median(pos) < 2.0, pos

        # records landed in the store
        stored = testing.load_records(91, branch="test", root=root)
        assert stored and len(stored[-1]["records"]) == len(paths)

    def test_dashboard_renders(self, small_set):
        root, _ = small_set
        written = testing.render_dashboard(set_ids=(91,), root=root)
        names = {p.name for p in written}
        assert "index.html" in names
        assert any(p.suffix == ".png" for p in written)

    def test_committed_baselines_are_current_format(self):
        """The committed baselines for every generated set parse, carry
        the metric set, and cover the reference's curated-set scale
        (100 well-modeled / 50 random / 14 hard; docs/regression.rst:4-12
        analog = sets 6/4/5 totaling 164 blends)."""
        import pathlib

        sizes = {4: 50, 5: 14, 6: 100, 7: 25}
        for set_id, n in sizes.items():
            path = (pathlib.Path(testing.__file__).parent
                    / f"baselines/set{set_id}.json")
            runs = json.loads(path.read_text())
            records = runs[-1]["records"]
            assert len(records) == n, (set_id, len(records))
            for key in ("logL", "iterations", "init logL", "n_sources"):
                assert key in records[0]
            med = sorted(r["logL"] for r in records)[n // 2]
            assert np.isfinite(med)


class TestStreamPipeline:
    def test_stream_matches_lite_pipeline(self, small_set):
        """The device stream pipeline reproduces the batched lite pipeline
        on a generated set: same logL per blend (small init differences can
        move individual optima slightly) and truth-matched magnitudes."""
        root, paths = small_set
        res_l = testing.deblend_and_measure(
            set_ids=(91,), paths=paths, save=False, pipeline="lite",
            max_iter=20)
        res_s = testing.deblend_and_measure(
            set_ids=(91,), paths=paths, save=False, pipeline="stream",
            max_iter=20)
        ll = np.asarray([r["logL"] for r in res_l[91]])
        ls = np.asarray([r["logL"] for r in res_s[91]])
        assert np.all(np.abs(ls - ll) < 0.02 * np.abs(ll))
        for rec in res_s[91]:
            assert rec["logL"] > rec["init logL"]
            diffs = [s for s in rec["sources"] if "r diff" in s]
            assert diffs, "no truth-matched sources measured"
            pos = [s["pos diff"] for s in rec["sources"] if "pos diff" in s]
            assert pos, "no astrometric errors measured"
            assert np.median(pos) < 2.0, pos


class TestDetectionQuality:
    def test_matching_logic(self):
        """detection_metrics: greedy nearest matching, radius cut,
        completeness/false-rate accounting."""
        from scarlet_tpu.testing.measure import detection_metrics

        truth = [(10, 10), (20, 20), (40, 40)]
        det = [(10.5, 10.0), (21, 21), (5, 35), (30, 30)]
        m = detection_metrics(truth, det, match_radius=3.0)
        assert m["n_matched"] == 2                # (10,10) and (20,20)
        assert m["completeness"] == pytest.approx(2 / 3)
        assert m["false_rate"] == pytest.approx(2 / 4)
        assert m["match_dist"] == pytest.approx(
            (0.5 + np.sqrt(2)) / 2, rel=1e-6)

    def test_matching_edges(self):
        from scarlet_tpu.testing.measure import detection_metrics

        empty = detection_metrics([], [], match_radius=3.0)
        assert empty["completeness"] == 1.0 and empty["false_rate"] == 0.0
        none_found = detection_metrics([(5, 5)], [], match_radius=3.0)
        assert none_found["completeness"] == 0.0
        # one detection cannot match two truths (greedy removes the pair)
        m = detection_metrics([(5, 5), (6, 6)], [(5, 5)], match_radius=3.0)
        assert m["n_matched"] == 1

    def test_detection_quality_device_host_agree(self, small_set):
        """The harness entry scores the same catalogs through the device
        and host detection paths (bit-identical peak sets)."""
        from scarlet_tpu.testing.api import detection_quality

        root, paths = small_set
        dev = detection_quality(set_ids=(4,), paths=paths, device=True)
        host = detection_quality(set_ids=(4,), paths=paths, device=False)
        for a, b in zip(dev[4]["blends"], host[4]["blends"]):
            assert a == b
        assert 0.0 <= dev[4]["completeness"] <= 1.0
        assert dev[4]["n_truth"] > 0
        assert dev[4]["n_matched"] <= min(dev[4]["n_truth"],
                                          dev[4]["n_detected"])


class TestShapeMetrics:
    def test_isolated_galaxy_shape_recovery(self, tmp_path):
        """e1/e2/size errors vs truth moments on an isolated extended
        galaxy (seed chosen to generate one): the stream fit recovers
        the shape to the monotonic-model's accuracy."""
        from scarlet_tpu.testing.api import deblend_and_measure
        from scarlet_tpu.testing.blendsets import generate_blend

        rng = np.random.default_rng(6)      # one galaxy, radius 2.3
        b = generate_blend(rng, n_sources=1)
        assert not b["catalog"][0]["is_star"]
        p = tmp_path / "blend_000.npz"
        np.savez_compressed(p, **b)
        res = deblend_and_measure(set_ids=(99,), paths=[p], save=False,
                                  pipeline="stream", max_iter=100)
        src = res[99][0]["sources"][0]
        for key in ("e1 diff", "e2 diff", "size diff"):
            assert key in src, key
        assert abs(src["e1 diff"]) < 0.2
        assert abs(src["e2 diff"]) < 0.2
        assert abs(src["size diff"]) < 0.15

    def test_shape_metrics_in_lite_pipeline(self, small_set):
        """The lite (host-model) pipeline also reports the shape
        metrics, from the assembled source models."""
        from scarlet_tpu.testing.api import deblend_and_measure

        root, paths = small_set
        res = deblend_and_measure(set_ids=(90,), paths=paths[:2],
                                  save=False, pipeline="lite",
                                  max_iter=20)
        srcs = [s for r in res[90] for s in r["sources"]]
        assert any("e1 diff" in s for s in srcs)
        for s in srcs:
            if "size diff" in s:
                assert np.isfinite(s["size diff"])
