"""Diag: sub-stage times of the pooled decode's reassembly tail.

Measures, with fences: pool-output concat+pad to Rmax, the inverse row
gather, the per-epoch shifted-sum accumulation, and the final transpose —
plus A/Bs a zero-batch-eliding variant of the concat+gather.
Usage: python scripts/ab_pooled_tail.py [image|text] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "image"
    import jax
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

    group, cell, seg = dp.GROUP_VAR, dp.CELL, 128
    seg2, cell2, group2, batch = 32, dp.CELL, 1024, 2048
    group = max(128, min(group, N))
    while N % group and group > 128:
        group //= 2

    # Reproduce the driver up to the pass-2 outputs.
    words, stats, pair, dense, data_ok = dp._variable_pass1_from_payloads(
        pay, cdev, jnp.asarray(sched_arr), spec, S, B, False, group, cell,
        seg, pair2=True,
    )
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
    (dense_s, pair_s, nloc_s, te_sorted_dev, inv, cum_dev,
     stats_dev) = (
        dp._pool_sort_device(dense, pair, cdev, te, bounds, L, bt)
    )
    te_bm = np.asarray(stats_dev)[: U // bt]
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
            dense_s[rows], dp._as_pair4d(pair_s[rows], g2), nloc_s[rows],
            te_sorted_dev[rows], r_need, alphabet=spec.alphabet_size,
            group=g2, cell=cell2, seg=seg2,
            first_free=spec.first_free_code,
        )
        outs.append(out_k)
        widths.append(out_k.shape[1])
    Rmax = max(widths)
    jax.block_until_ready([o for o in outs if o is not None])
    print(f"# E={E} U={U} bt={bt} widths={widths} Rmax={Rmax}", flush=True)

    cum = jnp.cumsum(te, axis=1) - te
    Bp = max(Bp2, Rmax)

    # --- stage A: current tail (concat to Rmax incl zero batches) ---------
    @jax.jit
    def concat_full(outs_nz):
        pool_parts = []
        i = 0
        for k in range(U // bt):
            if widths[k] == 0:
                pool_parts.append(jnp.zeros((bt, Rmax), jnp.uint8))
            else:
                o = outs_nz[i]
                i += 1
                if o.shape[1] < Rmax:
                    o = jnp.pad(o, ((0, 0), (0, Rmax - o.shape[1])))
                pool_parts.append(o)
        return jnp.concatenate(pool_parts, axis=0)

    @jax.jit
    def inv_take(mat, inv):
        return jnp.take(mat, inv, axis=0)

    outs_nz = [o for o in outs if o is not None]

    def fence(x):
        jax.block_until_ready(x)
        return time.perf_counter()

    def t3(f, *a):
        f(*a)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(*a)
            best = min(best, fence(r) - t0)
        return best, f(*a)

    tA, out_sorted = t3(concat_full, outs_nz)
    tB, out_pool = t3(inv_take, out_sorted, inv)

    parts = [out_pool[e * N : (e + 1) * N] for e in range(E)]
    cums = [cum[:, e] for e in range(E)]

    def acc_run(parts, cums):
        return dp._assemble_epochs_acc(tuple(parts), tuple(cums), Bp, E)

    accf = jax.jit(acc_run)
    tC, acc = t3(accf, parts, cums)
    tD, out = t3(jax.jit(
        lambda a: dp._assemble_epochs_t(a, B)), acc)
    assert (np.asarray(out) == db_np).all(), "byte check"
    print(f"concat+pad: {tA:.3f}s  inv-take: {tB:.3f}s  "
          f"acc: {tC:.3f}s  transpose: {tD:.3f}s", flush=True)

    # --- stage B: zero-elided concat + clamped gather ---------------------
    nz = [k for k in range(U // bt) if widths[k] > 0]
    Z = (U // bt - len(nz)) * bt  # sorted zero rows all precede nonzero

    @jax.jit
    def concat_nz(outs_nz):
        pool_parts = []
        for o in outs_nz:
            if o.shape[1] < Rmax:
                o = jnp.pad(o, ((0, 0), (0, Rmax - o.shape[1])))
            pool_parts.append(o)
        z = jnp.zeros((1, Rmax), jnp.uint8)
        return jnp.concatenate([z] + pool_parts, axis=0)

    @jax.jit
    def inv_take_nz(mat, inv):
        idx = jnp.maximum(inv - (Z - 1), 0)
        return jnp.take(mat, idx, axis=0)

    tA2, out_sorted2 = t3(concat_nz, outs_nz)
    tB2, out_pool2 = t3(inv_take_nz, out_sorted2, inv)
    assert (np.asarray(out_pool2) == np.asarray(out_pool)).all()
    print(f"zero-elided concat: {tA2:.3f}s  take: {tB2:.3f}s "
          f"(Z={Z} of {U})", flush=True)


if __name__ == "__main__":
    main()
