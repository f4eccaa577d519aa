"""Device-side detection (parallel.detection): the vmapped XLA catalog
recipe must reproduce the host starlet-footprint peak pipeline
(detect.py:517-572 semantics, i.e. the reference's detect_pybind11.cc
footprints + local-maxima) and feed the stream without a host catalog."""
import numpy as np
import pytest
from scipy import ndimage

from scarlet_tpu import lite, parallel
from scarlet_tpu.detect import get_peaks
from scarlet_tpu.parallel.detection import label_components_device
from scarlet_tpu.testing.blendsets import generate_blend


@pytest.fixture(scope="module")
def hsc():
    d = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
    return {
        "images": d["images"].astype(np.float32),
        "variance": d["variance"].astype(np.float32),
        "psfs": d["psfs"].astype(np.float32),
        "model_psf": lite.integrated_circular_gaussian(
            sigma=0.8)[None].astype(np.float32),
    }


def _active_set(centers, active):
    centers = np.asarray(centers)
    active = np.asarray(active)
    return {tuple(map(int, c)) for c, a in zip(centers, active) if a}


class TestLabeling:
    def test_matches_scipy_4_connectivity(self):
        """The min-propagation + pointer-jumping labels must induce the
        same partition as scipy.ndimage.label with the plus structure
        (= the reference's 4-neighbor flood fill,
        detect_pybind11.cc:61-124)."""
        rng = np.random.default_rng(7)
        for density in (0.2, 0.45, 0.7):
            pos = rng.random((41, 37)) < density
            lab = np.asarray(label_components_device(pos))
            ref, n = ndimage.label(
                pos, structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
            pairs = set(zip(lab[pos].tolist(), ref[pos].tolist()))
            # bijection between device and scipy component ids
            assert len(pairs) == n
            assert len({p[0] for p in pairs}) == n
            assert len({p[1] for p in pairs}) == n
            # background sentinel
            assert (lab[~pos] == pos.size).all()

    def test_serpentine_component(self):
        """A single snake-shaped component (worst case for plain label
        propagation) must settle to one label — pointer jumping keeps
        the while_loop short but must stay exact."""
        pos = np.zeros((12, 12), bool)
        for r in range(12):
            pos[r, :] = True
            if r % 2 == 0:
                pos[r, : 11] = r % 4 == 0
                pos[r, 11 if r % 4 == 0 else 0] = True
        pos[1::2, :] = False
        pos[1::2, 0] = True
        pos[1::2, 11] = True
        lab = np.asarray(label_components_device(pos))
        ref, n = ndimage.label(pos,
                               structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        assert len(np.unique(lab[pos])) == n


class TestPeakParity:
    def test_hsc_exact(self, hsc):
        """Exact peak-set parity with the host pipeline on the real
        HSC blend (ref detect.py:517-572)."""
        host = set(map(tuple, get_peaks(images=hsc["images"],
                                        variance=hsc["variance"])))
        centers, active, n_found = parallel.detect_peaks_device(
            hsc["images"][None], hsc["variance"][None], max_peaks=32)
        assert _active_set(centers[0], active[0]) == host
        assert int(n_found[0]) == len(host)

    def test_generated_blends_exact(self):
        """Exact parity across a batch of synthetic blends with varying
        source counts/positions/seeing, run as ONE vmapped program."""
        rng = np.random.default_rng(3)
        blends = [generate_blend(rng) for _ in range(6)]
        images = np.stack([b["images"] for b in blends])
        variance = np.stack([np.ascontiguousarray(b["variance"])
                             for b in blends])
        centers, active, n_found = parallel.detect_peaks_device(
            images, variance, max_peaks=48)
        for i, b in enumerate(blends):
            host = set(map(tuple, get_peaks(images=b["images"],
                                            variance=b["variance"])))
            assert _active_set(centers[i], active[i]) == host, i
            assert int(n_found[i]) == len(host)

    def test_brightest_first_and_overflow(self, hsc):
        """max_peaks smaller than the peak count keeps the brightest
        (the reference sorts peaks by flux, detect_pybind11.cc:150-160)
        and reports the uncut count."""
        call = parallel.detect_peaks_device
        full_c, full_a, n_full = call(hsc["images"][None],
                                      hsc["variance"][None], max_peaks=32)
        k = int(n_full[0]) - 3
        cut_c, cut_a, n_cut = call(hsc["images"][None],
                                   hsc["variance"][None], max_peaks=k)
        assert int(n_cut[0]) == int(n_full[0])  # pre-cut count unchanged
        assert bool(cut_a[0].all())
        # brightest-first: the cut catalog is the first k rows of the full
        assert np.array_equal(np.asarray(cut_c[0]),
                              np.asarray(full_c[0][:k]))

    def test_spike_scene_parity(self):
        """A single-pixel spike plus a real blob: the device catalog
        must equal the host's (the spike's scale-1 wavelet response is
        itself several pixels, so both pipelines keep it — this pins
        the behavior rather than assuming the spike is culled)."""
        rng = np.random.default_rng(11)
        C, H, W = 2, 48, 40
        variance = np.full((C, H, W), 1e-4, np.float32)
        images = (rng.standard_normal((C, H, W)).astype(np.float32)
                  * np.sqrt(variance))
        images[:, 10, 10] += 50.0          # single-pixel spike
        yy, xx = np.mgrid[:H, :W]
        blob = np.exp(-((yy - 30) ** 2 + (xx - 25) ** 2) / (2 * 2.0 ** 2))
        images += 30.0 * blob[None].astype(np.float32)  # real source
        host = set(map(tuple, get_peaks(images=images, variance=variance)))
        centers, active, _ = parallel.detect_peaks_device(
            images[None], variance[None], max_peaks=16)
        dev = _active_set(centers[0], active[0])
        assert dev == host
        assert (30, 25) in dev

    def test_plane_segmentation_matches_get_footprints(self):
        """The segmentation stage alone (peak_mask_from_plane) must
        reproduce the host footprints' peaks — incl. the min_area=4
        bbox/area cuts (detect_pybind11.cc:241-280) — on arbitrary
        planes with many tiny components."""
        from scarlet_tpu.detect import get_footprints
        from scarlet_tpu.parallel.detection import peak_mask_from_plane

        rng = np.random.default_rng(23)
        for _ in range(6):
            plane = rng.standard_normal((37, 43)).astype(np.float64)
            plane[plane < 0.6] = 0.0       # sparse positive speckle
            host = set()
            for fp in get_footprints(plane, min_separation=0, min_area=4,
                                     thresh=0):
                host.update((p.y, p.x) for p in fp.peaks)
            mask = np.asarray(peak_mask_from_plane(plane))
            dev = set(zip(*map(list, np.nonzero(mask))))
            assert dev == host

    def test_min_separation_culling_parity(self):
        """min_separation > 0: the device's brightness-greedy
        per-footprint culling must match the host footprints'
        (_find_peaks culling, ref detect_pybind11.cc:104-195)."""
        from scarlet_tpu.detect import get_detect_wavelets, get_footprints

        rng = np.random.default_rng(19)
        for trial in range(3):
            b = generate_blend(rng)
            images = b["images"]
            variance = np.ascontiguousarray(b["variance"])
            plane = get_detect_wavelets(images, variance, scales=3)[1]
            for sep in (2.0, 5.0):
                host = set()
                for fp in get_footprints(plane, min_separation=sep,
                                         min_area=4, thresh=0):
                    host.update((p.y, p.x) for p in fp.peaks)
                centers, active, n_found = parallel.detect_peaks_device(
                    images[None], variance[None], max_peaks=48,
                    min_separation=sep)
                dev = _active_set(centers[0], active[0])
                assert dev == host, (trial, sep)
                assert int(n_found[0]) == len(host)

    def test_blank_scene_finds_nothing(self):
        """Pure noise-free zero images: no footprints, no peaks, all
        catalog rows inactive (the stream then fits an empty model)."""
        images = np.zeros((1, 3, 40, 36), np.float32)
        variance = np.full_like(images, 1e-4)
        centers, active, n_found = parallel.detect_peaks_device(
            images, variance, max_peaks=8)
        assert int(n_found[0]) == 0
        assert not np.asarray(active).any()

    def test_scene_valid_padding_is_silent(self):
        """Zero-padded heterogeneous crops: padding must produce no
        peaks, and the valid-region catalog must match the natural
        crop's."""
        rng = np.random.default_rng(5)
        b = generate_blend(rng)
        images = b["images"]
        variance = np.ascontiguousarray(b["variance"])
        C, H, W = images.shape
        PH, PW = H + 14, W + 10
        pim = np.zeros((C, PH, PW), np.float32)
        pva = np.zeros((C, PH, PW), np.float32)
        pim[:, :H, :W] = images
        pva[:, :H, :W] = variance
        valid = np.zeros((PH, PW), np.float32)
        valid[:H, :W] = 1.0
        nat_c, nat_a, _ = parallel.detect_peaks_device(
            images[None], variance[None], max_peaks=32)
        pad_c, pad_a, _ = parallel.detect_peaks_device(
            pim[None], pva[None], valid[None], max_peaks=32)
        assert _active_set(pad_c[0], pad_a[0]) == _active_set(nat_c[0],
                                                              nat_a[0])


class TestStreamIntegration:
    @pytest.mark.slow
    def test_stream_centers_none_matches_explicit_catalog(self, hsc):
        """deblend_device_stream(centers=None) must equal the same
        stream fed its own detected catalog explicitly — detection only
        replaces the catalog, bitwise."""
        images = hsc["images"][None]
        variance = hsc["variance"][None]
        psfs = hsc["psfs"][None]
        centers, active, _ = parallel.detect_peaks_device(
            images, variance, max_peaks=10)
        rec_c, _, losses_c, _ = parallel.deblend_device_stream(
            images, variance, psfs, np.asarray(centers), hsc["model_psf"],
            center_active=np.asarray(active), box_size=31, n_slots=10,
            max_iter=20, check_every=10)
        rec_d, _, losses_d, aux = parallel.deblend_device_stream(
            images, variance, psfs, None, hsc["model_psf"],
            box_size=31, n_slots=10, max_iter=20, check_every=10)
        assert np.array_equal(np.asarray(losses_c), np.asarray(losses_d))
        for a, b in zip(rec_c, rec_d):
            assert np.array_equal(np.asarray(a["flux"]),
                                  np.asarray(b["flux"]))
        host = set(map(tuple, get_peaks(images=hsc["images"],
                                        variance=hsc["variance"])))
        assert _active_set(aux["centers"][0], aux["center_active"][0]) \
            == host
        assert int(aux["detected_peaks"][0]) == len(host)

    @pytest.mark.slow
    def test_centers_none_wavelet_recipe(self, hsc):
        """Device detection composes with the wavelet init recipe: the
        catalog feeds recipe='wavelets' unchanged."""
        images = hsc["images"][None]
        variance = hsc["variance"][None]
        psfs = hsc["psfs"][None]
        rec, _, _, aux = parallel.deblend_device_stream(
            images, variance, psfs, None, hsc["model_psf"],
            box_size=31, n_slots=10, max_iter=20, check_every=10,
            recipe="wavelets")
        host = set(map(tuple, get_peaks(images=hsc["images"],
                                        variance=hsc["variance"])))
        assert _active_set(aux["centers"][0], aux["center_active"][0]) \
            == host
        assert np.isfinite(rec[0]["logL"])
        assert rec[0]["logL"] > rec[0]["init logL"]

    def test_centers_none_sanitizes_before_detecting(self, hsc):
        """NaN/inf pixels must be sanitized BEFORE device detection in
        stream_setup: corrupt input == pre-sanitized input, bitwise."""
        images = hsc["images"].copy()
        variance = hsc["variance"].copy()
        images[:, :3, :4] = np.nan
        variance[1, 10:12, 10:12] = -1.0
        # pre-sanitize with the stream's rules
        bad = (~(np.isfinite(images) & np.isfinite(variance))
               | (variance < 0))
        im_c = np.where(bad, np.float32(0), images)
        vcnt = np.maximum((~bad).sum(axis=(-2, -1)), 1)
        vfill = (np.where(bad, 0, variance).sum(axis=(-2, -1))
                 / vcnt)[:, None, None]
        var_c = np.where(bad, vfill, variance).astype(np.float32)

        _, _, _, aux_raw = parallel.stream_setup(
            images[None], variance[None], hsc["psfs"][None], None,
            hsc["model_psf"], box_size=31, n_slots=8)
        _, _, _, aux_cln = parallel.stream_setup(
            im_c[None], var_c[None], hsc["psfs"][None], None,
            hsc["model_psf"], box_size=31, n_slots=8)
        assert np.array_equal(np.asarray(aux_raw["centers"]),
                              np.asarray(aux_cln["centers"]))
        assert np.array_equal(np.asarray(aux_raw["center_active"]),
                              np.asarray(aux_cln["center_active"]))

    @pytest.mark.slow
    def test_redetect_grows_catalog_and_improves(self):
        """redetect=1 on crowded blends: residual re-detection grows the
        catalog, the refit improves logL, and the final aux surfaces the
        grown catalog (chunked path included)."""
        rng = np.random.default_rng(1007)
        blends = [generate_blend(rng, n_sources=10, min_sep=3.0)
                  for _ in range(4)]
        images = np.stack([b["images"] for b in blends])
        variance = np.stack([np.ascontiguousarray(b["variance"])
                             for b in blends])
        psfs = np.stack([b["psfs"] for b in blends])
        mp = __import__("scarlet_tpu.lite", fromlist=["lite"]) \
            .integrated_circular_gaussian(sigma=0.8)[None].astype(
                np.float32)
        # each pass runs the full budget from a cold re-init, so the
        # refit needs a real iteration budget (20 its leaves the grown
        # model undertrained and logL can regress)
        common = dict(box_size=31, n_slots=24, max_peaks=12, max_iter=60,
                      check_every=20, chunk=2)
        r0, _, _, aux0 = parallel.deblend_device_stream(
            images, variance, psfs, None, mp, **common)
        r1, _, _, aux1 = parallel.deblend_device_stream(
            images, variance, psfs, None, mp, redetect=1, **common)
        n0 = np.concatenate([np.asarray(a["center_active"]).sum(1)
                             for a in (aux0 if isinstance(aux0, list)
                                       else [aux0])])
        n1 = np.concatenate([np.asarray(a["center_active"]).sum(1)
                             for a in (aux1 if isinstance(aux1, list)
                                       else [aux1])])
        assert np.all(n1 >= n0)
        assert n1.sum() > n0.sum()      # at least one blend grew
        # the grown catalog matches MORE truth sources
        from scarlet_tpu.testing.measure import detection_metrics

        def matched(auxs):
            total = 0
            o = 0
            for a in (auxs if isinstance(auxs, list) else [auxs]):
                c = np.asarray(a["centers"])
                m = np.asarray(a["center_active"])
                for i in range(c.shape[0]):
                    t = np.stack([blends[o + i]["catalog"]["y"],
                                  blends[o + i]["catalog"]["x"]], 1)
                    total += detection_metrics(t, c[i][m[i]])["n_matched"]
                o += c.shape[0]
            return total

        assert matched(aux1) > matched(aux0)
        # fits stay healthy: finite, no catastrophic regression (each
        # pass re-initializes cold, so per-blend logL parity, not strict
        # improvement, is the contract at a fixed budget)
        l0 = np.asarray([r["logL"] for r in r0])
        l1 = np.asarray([r["logL"] for r in r1])
        assert np.all(np.isfinite(l1))
        assert np.all(l1 > l0 - 0.05 * np.abs(l0))

    def test_centers_none_rejects_center_active(self, hsc):
        with pytest.raises(ValueError):
            parallel.stream_setup(
                hsc["images"][None], hsc["variance"][None],
                hsc["psfs"][None], None, hsc["model_psf"],
                center_active=np.ones((1, 4), bool), box_size=31,
                n_slots=4)
