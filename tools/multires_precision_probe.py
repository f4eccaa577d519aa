"""Quantify the ResolutionRenderer matmul-precision pin ON CHIP.

The multires sinc-resampling einsums (models/resolution.py) ran at XLA
DEFAULT precision before the r5 pin — 1-pass bf16 on TPU — which the CPU
suite (exact f32 at every tier) cannot detect.  The rotated render
cannot run eagerly on the TPU backend (odd FFT shapes), so this probe
isolates exactly what the pin changes: it builds the rotated-pair
renderer from tests/test_multiresolution.py, computes the renderer's
real contraction operands (the kernel stack ``_A`` and the shifted
model stack ``B``) on CPU, then runs the ``icv,jcv->cij`` contraction
on the chip at DEFAULT (pre-pin), "high", and "float32" (shipped pin),
reporting max|diff| and SDR vs the CPU f32 contraction.

Run: python tools/multires_precision_probe.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tests")
    from test_multiresolution import make_pair, embed_centered, SDR
    import scarlet_tpu as st
    from scarlet_tpu.ops import fft as fft_ops

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        obs_hr, obs_lr, data_hr, data_lr = make_pair(
            rotation_lr=np.deg2rad(28))
        st.Frame.from_observations([obs_lr, obs_hr], obs_id=1,
                                   coverage="union")
        r = obs_lr.renderer
        assert r.isrot
        model = embed_centered(data_hr[None], obs_hr.model_frame)

        # reproduce the rotated transform up to the final contraction
        # (models/resolution.py rotated branch) on CPU
        model_ = r.map_channels(jnp.asarray(model))
        fh, fw = r._fft_shape
        shifter_y, shifter_x = fft_ops.mk_shifter(r._fft_shape)
        m_fft = fft_ops.transform(model_, r._fft_shape, (-2, -1))
        phase_j = (
            jnp.exp(shifter_y[None, :, None]
                    * (-r._o_shifts[:, 0])[:, None, None])
            * jnp.exp(shifter_x[None, None, :]
                      * (-r._o_shifts[:, 1])[:, None, None]))
        B_fft = m_fft[None] * phase_j[:, None]
        B = jnp.fft.irfftn(B_fft, r._fft_shape, axes=(-2, -1))
        B = jnp.fft.fftshift(B, (-2, -1))
        B = B.reshape(r._Nx_lr, model_.shape[0], -1)
        A = jnp.asarray(r._A)
        ref = np.asarray(
            jnp.einsum("icv,jcv->cij", A, B, precision="float32"))

    A_np, B_np = np.asarray(A), np.asarray(B)
    print(f"operands: A {A_np.shape}, B {B_np.shape}; "
          f"render peak {np.max(np.abs(ref)):.3e}", flush=True)

    A_d = jax.device_put(A_np, dev)
    B_d = jax.device_put(B_np, dev)

    @jax.jit
    def contract_default(a, b):
        return jnp.einsum("icv,jcv->cij", a, b)

    @jax.jit
    def contract_high(a, b):
        return jnp.einsum("icv,jcv->cij", a, b, precision="high")

    @jax.jit
    def contract_f32(a, b):
        return jnp.einsum("icv,jcv->cij", a, b, precision="float32")

    sdr_px = (r.h ** 2)  # flux scaling is uniform; diffs scale the same
    for tag, fn in (("DEFAULT (pre-pin)", contract_default),
                    ("high (3-pass)", contract_high),
                    ("float32 (shipped)", contract_f32)):
        out = np.asarray(fn(A_d, B_d))
        print(f"{tag:>18}: max|diff vs cpu f32| "
              f"{np.max(np.abs(out - ref)):.3e} "
              f"(rel {np.max(np.abs(out - ref)) / np.max(np.abs(ref)):.2e}),"
              f" SDR vs analytic LR "
              f"{SDR(data_lr, out.reshape(ref.shape)[0] * sdr_px):6.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
