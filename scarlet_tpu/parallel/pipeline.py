"""Multiprocess host pipeline for production blend streams.

The batched TPU fit runs at thousands of blends/min, but the host-side
work around it — per-blend initialization, engine setup, and post-fit
write-back — is Python/numpy and GIL-bound (~150 ms/blend single-stream).
This module spreads that work over persistent CPU worker processes while
the main process drives the accelerator:

    workers: raw arrays -> LiteBlend -> (data, state) numpy pytrees
    main:    stack -> fit_batch_device_converged (TPU) -> scatter back
    workers: write-back + flux reweighting + measurements -> records

Each worker owns a fixed shard of the stream (blend ``i`` lives in worker
``i % n_workers`` for the whole run), so blend objects never cross
process boundaries — only arrays do.  Workers pin JAX to the CPU backend;
they must never touch the accelerator.

This is the TPU-native replacement for the reference's "run many blends
as independent jobs" scaling story (testing/api.py:216-226), with the
accelerator fit batched across the whole stream instead of per-job.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["BlendPipeline", "deblend_stream", "build_lite_blend"]


def build_lite_blend(blob, min_snr=50, model_psf_sigma=0.8):
    """Canonical worker-side builder: a dict of raw arrays (``images``,
    ``variance``, ``psfs``, ``centers``, optional ``weights``) -> an
    initialized, parameterized ``LiteBlend``.  Module-level so it pickles
    into pipeline workers; custom pipelines can pass their own builder."""
    from .. import lite

    images = np.asarray(blob["images"], np.float32)
    variance = np.asarray(blob["variance"], np.float32)
    weights = np.asarray(
        blob.get("weights", 1.0 / np.maximum(variance, 1e-12)), np.float32)
    psfs = np.asarray(blob["psfs"], np.float32)
    model_psf = lite.integrated_circular_gaussian(
        sigma=model_psf_sigma)[None].astype(np.float32)
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    centers = [(int(round(y)), int(round(x))) for y, x in blob["centers"]]
    sources = lite.init_all_sources_main(obs, centers, min_snr=min_snr)
    sources = lite.parameterize_sources(sources, obs,
                                        lite.init_adaprox_component)
    return lite.LiteBlend(sources, obs)


# ----------------------------------------------------------------------------
# Worker process: owns a shard of blends, CPU-pinned JAX
# ----------------------------------------------------------------------------
def _worker_main(conn):
    import jax

    jax.config.update("jax_platforms", "cpu")

    blends = {}

    def build(payload):
        build_fn, build_kwargs, items = payload
        out = []
        for idx, blob in items:
            blend = build_fn(blob, **build_kwargs)
            blends[idx] = blend
            C, H, W = blend.observation.shape
            sizes = [max(c.bbox.shape[-2], c.bbox.shape[-1])
                     for c in blend.components]
            dk = blend.observation.diff_kernel
            out.append((idx, {
                "shape": (C, H, W),
                "n_comps": len(blend.components),
                "max_size": max(sizes) if sizes else 1,
                "kernel_shape": None if dk is None else
                tuple(np.asarray(dk.image).shape),
            }))
        return out

    def setup(payload):
        layout, e_rel, min_iter, platform, idxs = payload
        to_np = lambda t: jax.tree.map(  # noqa: E731
            lambda x: None if x is None else np.asarray(x), t,
            is_leaf=lambda x: x is None)
        out = []
        for idx in idxs:
            config, data, state = blends[idx].engine_setup(
                e_rel, min_iter, scene_shape=layout["scene_shape"],
                box_size=layout["box_size"], n_slots=layout["n_slots"],
                fft_shape=layout["fft_shape"], platform=platform)
            out.append((idx, config, to_np(data), to_np(state)))
        return out

    def writeback(payload):
        from ..lite.measure import weight_sources

        reweight, measure, items = payload
        out = []
        for idx, state_np, losses_np in items:
            blend = blends[idx]
            ran = int(state_np.it) - blend.it
            if losses_np is not None and ran > 0:
                blend.loss.extend(np.asarray(losses_np)[:ran].tolist())
            blend.it = int(state_np.it)
            blend._write_back(state_np)
            if reweight:
                weight_sources(blend)
            record = {
                "iterations": int(blend.it),
                "logL": float(blend.loss[-1]) if blend.loss
                else float("nan"),
                "init logL": float(blend.loss[0]) if blend.loss
                else float("nan"),
                "n_sources": len(blend.sources),
            }
            if measure:
                record["flux"] = [
                    (np.asarray(s.flux).sum(axis=(-2, -1))
                     if getattr(s, "flux", None) is not None
                     else np.asarray(s.get_model()).sum(axis=(-2, -1))
                     ).tolist()
                    for s in blend.sources
                ]
            out.append((idx, record))
        return out

    handlers = {"build": build, "setup": setup, "writeback": writeback}
    while True:
        msg = conn.recv()
        if msg is None:
            conn.close()
            return
        cmd, payload = msg
        try:
            conn.send(("ok", handlers[cmd](payload)))
        except BaseException as exc:  # surface worker errors to the driver
            import traceback

            conn.send(("err", f"{exc}\n{traceback.format_exc()}"))


class _WorkerPool:
    """Spawned workers with one duplex pipe each; blend ``i`` is owned by
    worker ``i % n``."""

    def __init__(self, n):
        import multiprocessing as mp
        import os

        ctx = mp.get_context("spawn")
        self.conns = []
        self.procs = []
        # children must never register/initialize an accelerator plugin
        # (N extra tunnel clients can wedge a TPU proxy): disarm the
        # accelerator sitecustomize trigger and pin the CPU backend in the
        # inherited environment, restoring the parent's afterwards
        saved = {k: os.environ.get(k)
                 for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            for _ in range(n):
                parent, child = ctx.Pipe()
                proc = ctx.Process(target=_worker_main, args=(child,),
                                   daemon=True)
                proc.start()
                child.close()
                self.conns.append(parent)
                self.procs.append(proc)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def scatter(self, cmd, payloads):
        """Send one (cmd, payload) per worker, gather all replies."""
        for conn, payload in zip(self.conns, payloads):
            conn.send((cmd, payload))
        out = []
        for conn in self.conns:
            status, result = conn.recv()
            if status != "ok":
                raise RuntimeError(f"pipeline worker failed: {result}")
            out.extend(result)
        return out

    def close(self):
        for conn in self.conns:
            try:
                conn.send(None)
            except (BrokenPipeError, OSError):
                pass
        for proc in self.procs:
            proc.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ----------------------------------------------------------------------------
# Main-process driver
# ----------------------------------------------------------------------------
class BlendPipeline:
    """Persistent host pipeline: spawn the worker pool once, then push
    batches of blend blobs through ``run`` — amortizes worker startup and
    the accelerator compile across a long stream."""

    def __init__(self, n_workers=8, fit_device=None):
        import jax

        if fit_device is None:
            fit_device = jax.devices()[0]
        self.fit_device = fit_device
        self.n_workers = n_workers
        self.pool = _WorkerPool(n_workers)

    def close(self):
        self.pool.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def run(self, blobs, build_fn, build_kwargs=None, e_rel=1e-4,
            min_iter=1, max_iter=100, check_every=25, reweight=True,
            measure=True):
        """Deblend one batch of raw blend blobs end-to-end; returns one
        measurement record per blend, in input order.  Wall-clock of the
        phases lands in ``self.last_timings``."""
        import time

        import jax

        timings = {}
        t0 = time.perf_counter()

        def mark(name):
            nonlocal t0
            now = time.perf_counter()
            timings[name] = round(now - t0, 3)
            t0 = now

        from ..ops import fft as fft_ops
        from .batch import pack_batch, fit_batch_device_converged

        build_kwargs = build_kwargs or {}
        platform = self.fit_device.platform
        n_workers = self.n_workers
        pool = self.pool

        def shard(items):
            return [[it for i, it in enumerate(items)
                     if i % n_workers == w] for w in range(n_workers)]

        # phase 1: initialize all blends in their workers; learn layouts
        layouts = dict(pool.scatter("build", [
            (build_fn, build_kwargs, part)
            for part in shard(list(enumerate(blobs)))
        ]))

        # common static layout = elementwise maximum over the stream
        C = layouts[0]["shape"][0]
        H = max(v["shape"][1] for v in layouts.values())
        W = max(v["shape"][2] for v in layouts.values())
        cap = max(H, W) + 1
        box = 1
        for v in layouts.values():
            s = min(v["max_size"], cap)
            box = max(box, s + (s % 2 == 0))
        n_slots = max(v["n_comps"] for v in layouts.values())
        fft_shape = None
        for v in layouts.values():
            if v["kernel_shape"] is not None:
                fs = fft_ops.minimal_same_fft_shape(
                    (C, H, W), v["kernel_shape"], axes=(1, 2))
                fft_shape = fs if fft_shape is None else tuple(
                    max(a, b) for a, b in zip(fft_shape, fs))
        layout = {"scene_shape": (C, H, W), "box_size": box,
                  "n_slots": n_slots, "fft_shape": fft_shape}
        mark("init_s")

        # phase 2: per-blend engine pytrees at the shared layout
        idx_shards = shard(list(range(len(blobs))))
        setups, configs = {}, {}
        for idx, cfg, data, state in pool.scatter("setup", [
            (layout, e_rel, min_iter, platform, idxs)
            for idxs in idx_shards
        ]):
            configs[idx] = cfg
            setups[idx] = (data, state)

        mark("setup_s")
        pad = max(c.scene_pad for c in configs.values())
        config = dataclasses.replace(configs[0], scene_pad=pad)
        for c in configs.values():
            if dataclasses.replace(c, scene_pad=pad) != config:
                raise ValueError(f"incompatible configs: {c} vs {config}")

        # phase 3: stack + batched accelerator fit
        data, state = pack_batch([setups[i] for i in range(len(blobs))])
        data, state = jax.device_put((data, state), self.fit_device)
        out, losses = fit_batch_device_converged(
            state, data, config, max_iter, check_every=check_every)
        out = jax.device_get(out)
        losses = np.asarray(losses)
        mark("fit_s")

        # phase 4: scatter results back for write-back + measurement
        def sub(i):
            return jax.tree.map(lambda x: None if x is None else x[i],
                                out, is_leaf=lambda x: x is None)

        items = [(i, sub(i), losses[:, i]) for i in range(len(blobs))]
        records = [None] * len(blobs)
        for idx, rec in pool.scatter("writeback", [
            (reweight, measure, part) for part in shard(items)
        ]):
            records[idx] = rec
        mark("writeback_s")
        self.last_timings = timings
        return records


def deblend_stream(blobs, build_fn, build_kwargs=None, e_rel=1e-4,
                   min_iter=1, max_iter=100, check_every=25, n_workers=8,
                   reweight=True, measure=True, fit_device=None):
    """One-shot convenience around :class:`BlendPipeline` (spawns and
    tears down the worker pool; long streams should hold a pipeline)."""
    n_workers = max(1, min(n_workers, len(blobs)))
    with BlendPipeline(n_workers=n_workers, fit_device=fit_device) as pipe:
        return pipe.run(blobs, build_fn, build_kwargs=build_kwargs,
                        e_rel=e_rel, min_iter=min_iter, max_iter=max_iter,
                        check_every=check_every, reweight=reweight,
                        measure=measure)
