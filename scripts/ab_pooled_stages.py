"""Diag: stage times of the pooled stride-2 decode + the te_bm sync cost.

Fenced stage attribution distorts pipelining, so it is reported alongside a
clean A/B: default pooled decode vs a variant whose per-batch maxima are
precomputed (row rolls permute units but not the sorted maxima, so the
cached values stay exact) — isolating the mid-decode host round-trip.

NOTE: this script replicates the PRE-windowed-assembly tail (Rmax-padded
inverse gather + full-canvas epoch accumulation) — it is the measurement
that motivated `_assemble_epochs_windowed` (EVOLUTION.md r5 "windowed
placement assembly") and is kept as that record; the shipped driver's
tail is now the windowed one.
Usage: python scripts/ab_pooled_stages.py [image|text] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "image"
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import decode_pallas as dp, encode_pallas as ep
    from lzw_tpu.spec import LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    spec = LzwSpec.gif(7)
    B = 1 << 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    if corpus == "image":
        base = load_tokyo_pixels("test-assets/tokyo_128_colors.png")
        src = np.frombuffer(bytes(b % 128 for b in base), np.uint8)
    else:
        txt = open("test-assets/lorem_ipsum.txt", "rb").read()
        src = np.frombuffer(bytes(b % 128 for b in txt), np.uint8)

    up = jnp.asarray(src)
    np.asarray(up[:4])
    db = jnp.tile(up, -(-(N * B) // len(src)))[: N * B].reshape(N, B)
    np.asarray(db[0, :4])
    dl = jnp.full((N,), B, jnp.int32)
    pay, nb, _, _ = ep.encode_pack_variable_tpu(db, dl, spec, B)
    np.asarray(nb[:4])
    pb = int(np.asarray(jnp.max(nb)))
    pay = pay[:, :pb]
    counts, strict, sched_arr, S = dp.prepare_variable_decode(
        np.asarray(pay), np.asarray(nb), spec
    )
    assert strict.all()
    cdev = jnp.asarray(counts.astype(np.int32))
    db_np = np.asarray(db)
    print(f"# {corpus}: N={N}, S={S}", flush=True)

    # --- fenced stage walk (one pass, after warmup) -----------------------
    group, cell, seg = dp.GROUP_VAR, dp.CELL, 128
    seg2, cell2, group2, batch = 32, dp.CELL, 1024, 2048
    group = max(128, min(group, N))
    while N % group and group > 128:
        group //= 2

    def stages(p, c, te_bm_cached=None, fence=False):
        t = {}
        t0 = time.perf_counter()
        words, stats, pair, dense, data_ok = (
            dp._variable_pass1_from_payloads(
                p, c, jnp.asarray(sched_arr), spec, S, B, False, group,
                cell, seg, pair2=True,
            )
        )
        if fence:
            np.asarray(stats[:2, :2])
            t["pass1"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        totals = stats[:, 0]
        te = dp._epoch_totals(words, spec, S)
        bounds = dp.epoch_bounds(spec, S)
        E = len(bounds)
        L0 = max(b - a for (a, b) in bounds)
        L = ((L0 + seg2 - 1) // seg2) * seg2
        U = E * N
        bt = max(group2, min(batch, U))
        while U % bt and bt > group2:
            bt //= 2
        (dense_s, pair_s, nloc_s, te_sorted_dev, inv, cum,
         stats_dev) = (
            dp._pool_sort_device(dense, pair, c, te, bounds, L, bt)
        )
        if fence:
            np.asarray(inv[:4])
            t["sort"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        if te_bm_cached is None:
            te_bm = np.asarray(stats_dev)[: U // bt]
        else:
            te_bm = te_bm_cached
        t["sync"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        g2 = min(group2, bt)
        Bp2 = ((B + cell2 - 1) // cell2) * cell2
        outs, widths = [], []
        for k in range(U // bt):
            r_need = int(te_bm[k])
            if r_need <= 0:
                outs.append(None)
                widths.append(0)
                continue
            r_need = max(-(-r_need // 2048) * 2048, cell2)
            r_need = min(r_need, -(-Bp2 // 2048) * 2048)
            rows = slice(k * bt, (k + 1) * bt)
            out_k = dp.decode_pass2_stride2(
                dense_s[rows], dp._as_pair4d(pair_s[rows], g2),
                nloc_s[rows], te_sorted_dev[rows], r_need,
                alphabet=spec.alphabet_size, group=g2, cell=cell2,
                seg=seg2, first_free=spec.first_free_code,
            )
            outs.append(out_k)
            widths.append(out_k.shape[1])
        Rmax = max(widths)
        pool_parts = []
        for k, out_k in enumerate(outs):
            if out_k is None:
                pool_parts.append(jnp.zeros((bt, Rmax), jnp.uint8))
            elif out_k.shape[1] < Rmax:
                pool_parts.append(
                    jnp.pad(out_k, ((0, 0), (0, Rmax - out_k.shape[1])))
                )
            else:
                pool_parts.append(out_k)
        out_sorted = jnp.concatenate(pool_parts, axis=0)
        if fence:
            np.asarray(out_sorted[0, :2])
            t["pass2"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        out_pool = jnp.take(out_sorted, inv, axis=0)
        cum = jnp.cumsum(te, axis=1) - te
        parts = [out_pool[e * N : (e + 1) * N] for e in range(E)]
        cums = [cum[:, e] for e in range(E)]
        Bp = max(Bp2, Rmax)
        out = dp._assemble_epochs(tuple(parts), tuple(cums), Bp, B, E)
        np.asarray(totals[:4])
        np.asarray(out[0, :2])
        t["tail"] = time.perf_counter() - t0
        return out, te_bm, t

    out, te_bm0, _ = stages(pay, cdev)  # warmup + cache maxima
    assert (np.asarray(out) == db_np).all()
    print(f"# batches: {len(te_bm0)}, maxima {list(te_bm0)}", flush=True)

    for label, kw in (
        ("fenced", dict(fence=True)),
        ("default (sync)", dict()),
        ("cached te_bm (no sync)", dict(te_bm_cached=te_bm0)),
    ):
        best, bt = float("inf"), None
        for rep in range(3):
            k = rep + 1
            pv = jnp.roll(pay, k, axis=0)
            cv = jnp.roll(cdev, k)
            np.asarray(pv[0, :4])
            t0 = time.perf_counter()
            out, _, t = stages(pv, cv, **kw)
            dt = time.perf_counter() - t0
            if dt < best:
                best, bt = dt, t
            assert (np.asarray(out) == np.roll(db_np, k, axis=0)).all()
        rate = N * B / best / 2**20
        extra = " ".join(f"{k}={v:.3f}" for k, v in bt.items())
        print(f"{label}: {best:.3f}s = {rate:.1f} MiB/s  [{extra}]",
              flush=True)


if __name__ == "__main__":
    main()
