"""Variant-sweep profiler for the hot Pallas kernels on the attached TPU.

Times the BC7 and ASTC kernels at each quality, then re-times with
individual plan components disabled (monkeypatched plans) to attribute
q3/q4 cost to mode families.  Used to target perf work; not part of the
test suite.

Usage: python tools/profile_kernels.py [bc7|astc|all]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

IMAGE = 1024


def _surface(size=IMAGE):
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    surf = np.stack(
        [
            0.5 + 0.5 * np.sin(6.0 * x + 2.0 * y),
            0.5 + 0.5 * np.cos(4.0 * y + x),
            0.5 + 0.5 * np.sin(3.0 * (x + y)),
            np.ones_like(x),
        ],
        axis=-1,
    ).astype(np.float32)
    surf += rng.normal(0, 0.02, surf.shape).astype(np.float32)
    return np.clip(surf, 0.0, 1.0)


def time_fn(encode_fn, blocks, nwords, chain=4):
    @jax.jit
    def step(b):
        w = encode_fn(b)
        folded = w[:, 0]
        for c in range(1, nwords):
            folded = folded ^ w[:, c]
        return folded.astype(jnp.uint32).sum()

    placed = jax.device_put(blocks)
    float(np.asarray(step(placed)))

    def run(k):
        t0 = time.perf_counter()
        outs = [step(placed) for _ in range(k)]
        float(np.asarray(outs[-1]))
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    while True:
        tk = min(run(chain) for _ in range(3))
        if tk - t1 > 8e-3 or chain >= 256:
            break
        chain *= 4
    return max(tk - t1, 1e-9) / (chain - 1)


def mtex(dt):
    return IMAGE * IMAGE / dt / 1e6


def profile_bc7():
    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels import bc7_pallas as K

    surf = _surface()
    blocks, _, _ = extract_blocks(surf, 4, 4)

    def t(tag, quality):
        dt = time_fn(
            lambda b: K.encode_bc7_pallas(b, quality=quality), blocks, 4
        )
        print(f"bc7 {tag}: {mtex(dt):.1f} MT/s", flush=True)
        return dt

    base2 = t("q2 baseline", 2)

    # q2 attribution: drop one mode at a time from the lean kernel.
    import cuttlefish_tpu.kernels.bc7_pallas as KM

    orig_kernel = KM._kernel

    def variant2(tag, skip):
        def patched(x_ref, part2_ref, part2t_ref, anchors_ref, out_ref, *,
                    quality, chw):
            import jax.numpy as jnp_

            px = [x_ref[c] for c in range(4)]
            iters = {0: 1, 1: 2, 2: 2}[quality]
            words, err = KM._mode6(px, iters, chw)
            if "1" not in skip:
                w1, e1 = KM._mode1(
                    px, iters, chw, part2_ref[:], part2t_ref[:],
                    anchors_ref[:],
                )
                take = e1 < err
                words = [jnp_.where(take, a, b) for a, b in zip(w1, words)]
                err = jnp_.minimum(e1, err)
            encs = []
            if "5" not in skip:
                encs.append(KM._mode5)
            if "4" not in skip:
                encs.append(KM._mode4)
            for enc in encs:
                w2, e2 = enc(px, iters, chw)
                take = e2 < err
                words = [jnp_.where(take, a, b) for a, b in zip(w2, words)]
                err = jnp_.minimum(e2, err)
            for w in range(4):
                out_ref[w : w + 1, :] = words[w]

        KM._kernel = patched
        K.encode_bc7_pallas.clear_cache()
        dt = time_fn(
            lambda b: K.encode_bc7_pallas(b, quality=2), blocks, 4
        )
        print(
            f"bc7 q2 {tag}: {mtex(dt):.1f} MT/s"
            f" (saves {(base2 - dt) / base2 * 100:.0f}%)",
            flush=True,
        )
        KM._kernel = orig_kernel

    variant2("no mode1", "1")
    variant2("no mode5", "5")
    variant2("no mode4", "4")
    variant2("mode6 only", "145")
    K.encode_bc7_pallas.clear_cache()

    base = t("q4 baseline", 4)

    import copy

    full = copy.deepcopy(K._HQ_PLAN)

    def variant(tag, **kw):
        plan = copy.deepcopy(full)
        plan[4].update(kw)
        K._HQ_PLAN = plan
        K.encode_bc7_pallas.clear_cache()
        dt = time_fn(
            lambda b: K.encode_bc7_pallas(b, quality=4), blocks, 4
        )
        print(
            f"bc7 q4 {tag}: {mtex(dt):.1f} MT/s"
            f" (saves {(base - dt) / base * 100:.0f}%)",
            flush=True,
        )
        K._HQ_PLAN = full

    variant("no rotations", rot=(0,))
    variant("m1=0", m1=0)
    variant("m3=0", m3=0)
    variant("m7=0", m7=0)
    variant("m0=0", m0=0)
    variant("m2=0", m2=0)
    K.encode_bc7_pallas.clear_cache()


def profile_astc():
    from cuttlefish_tpu.convert.blocks import extract_blocks
    from cuttlefish_tpu.kernels import astc as A
    from cuttlefish_tpu.kernels import astc_pallas as K

    surf = _surface()
    blocks, _, _ = extract_blocks(surf, 4, 4)

    def t(tag, quality, gray=False):
        dt = time_fn(
            lambda b: K.encode_astc_pallas(b, 4, 4, quality, gray=gray),
            blocks, 4,
        )
        print(f"astc {tag}: {mtex(dt):.1f} MT/s", flush=True)
        return dt

    t("q2 baseline", 2)
    for q in (3, 4):
        base = t(f"q{q} baseline", q)

        import copy

        full = copy.deepcopy(A._PLAN)

        def variant(tag, **kw):
            plan = copy.deepcopy(full)
            plan[q].update(kw)
            A._PLAN = plan
            K._PLAN = plan
            K.encode_astc_pallas.clear_cache()
            dt = time_fn(
                lambda b: K.encode_astc_pallas(b, 4, 4, q, gray=False),
                blocks, 4,
            )
            print(
                f"astc q{q} {tag}: {mtex(dt):.1f} MT/s"
                f" (saves {(base - dt) / base * 100:.0f}%)",
                flush=True,
            )
            A._PLAN = full
            K._PLAN = full

        variant("seeds2=0", seeds2=0)
        variant("seeds3=0", seeds3=0)
        variant("no dual-plane", dp_ccs=())
        variant("cem8_layouts=1", cem8_layouts=1)
        variant("cem12_layouts=1", cem12_layouts=1)
        variant("iters-1", iters=full[q]["iters"] - 1)
        K.encode_astc_pallas.clear_cache()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("bc7", "all"):
        profile_bc7()
    if which in ("astc", "all"):
        profile_astc()
