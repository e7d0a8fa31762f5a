"""GB/s scaling harness: 1 chip measured, 1 host aggregated, N-host dryrun.

The BASELINE north star asks for throughput reported at 1 chip, 1 host, and
N >= 2 hosts.  This box has ONE v5e chip behind the axon relay, so:

* **1 chip** — measured HBM-to-HBM (bench.py methodology) for fixed-12
  encode, all-device decode, and the 64 KiB variable container encode.
* **1 host** — sum over the host's TPU devices of the per-chip rate.  Block
  data-parallelism has zero cross-device communication during encode/decode
  (the ordered gather of compressed payloads is host-side assembly), so the
  aggregate is linear in devices; with one device it equals the 1-chip row.
* **N hosts** — the DCN leg is validated *functionally* by launching real
  multi-process `jax.distributed` groups over localhost CPU (the same path
  `tests/test_multihost.py` gates: shape-identical allgather payload
  exchange + deterministic reconstruction), and the aggregate rate is
  reported as the linear projection per-chip x chips with that basis stated.
  CPU-mesh wall-clock is NOT a TPU number and is never reported as one.

Writes one JSON document (benchmarks/scaling_r{N}.json with --out).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


def measure_1chip(mb: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lzw_tpu.kernels import (
        decode_pallas as dp, encode_pallas as ep, schedule as sc,
    )
    from lzw_tpu.spec import LzwSpec
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    B = 4096
    base = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    N = max((mb << 20) // B, ep.GROUP)
    N = (N // ep.GROUP) * ep.GROUP
    data = (base * (N * B // len(base) + 1))[: N * B]
    mat = np.frombuffer(data, np.uint8).reshape(N, B)

    parts = []
    rows = max(1, (4 << 20) // B)
    for i in range(0, N, rows):
        p = jnp.asarray(mat[i : i + rows])
        np.asarray(p[0, :4])
        parts.append(p)
    db = jnp.concatenate(parts, axis=0)
    dl = jnp.full((N,), B, jnp.int32)

    out = {}

    def best_of(fn, reps=3):
        b = float("inf")
        for r in range(reps):
            b = min(b, fn(r))
        return b

    # Fixed-12 encode, HBM-to-HBM.
    def enc(d):
        return ep.encode_blocks_fixed_tpu(d, dl, B, compact="stage")

    bufs, nb = enc(db)
    np.asarray(nb[:4])

    def t_enc(rep):
        dvar = db.at[0, 0].set((rep + 1) % 251)
        np.asarray(dvar[0, :4])
        t0 = time.perf_counter()
        _, nb_ = enc(dvar)
        np.asarray(nb_[:4])
        return time.perf_counter() - t0

    out["fixed12_encode_Bps"] = N * B / best_of(t_enc)

    # All-device fixed-12 decode.
    pb_act = int(np.asarray(jnp.max(nb)))
    PB3 = ((pb_act + 2) // 3) * 3
    pay = bufs[:, :PB3]
    Nd = (N // dp.GROUP) * dp.GROUP
    pay = pay[:Nd]
    nbd = nb[:Nd]

    @jax.jit
    def dec(p, l):
        w, nc, tot, de, dec_, (pair, codes) = dp.decode_pass1_fixed_tpu(
            p, l, B, little=True
        )
        return dp.decode_pass2_device(codes, pair, nc, tot, B), tot

    o, tot = dec(pay, nbd)
    np.asarray(tot[:4])

    def t_dec(rep):
        pvar = pay.at[0, 0].set(rep % 251)
        np.asarray(pvar[0, :4])
        t0 = time.perf_counter()
        _, tot_ = dec(pvar, nbd)
        np.asarray(tot_[:4])
        return time.perf_counter() - t0

    out["fixed12_decode_Bps"] = Nd * B / best_of(t_dec)

    # Default-container variable encode (64 KiB chunked).
    gspec = LzwSpec.gif(7)
    BV = 1 << 16
    Nv = ep.GROUP_CHUNKED
    reps_v = -(-(Nv * BV) // (N * B))
    flat = jnp.tile(db.reshape(-1), reps_v) if reps_v > 1 else db.reshape(-1)
    dbv = (flat[: Nv * BV] % 128).reshape(Nv, BV)
    dlv = jnp.full((Nv,), BV, jnp.int32)

    def encv(d):
        # Two dispatches (see encode_pack_variable_tpu docstring).
        pay_, nb_, _, _ = ep.encode_pack_variable_tpu(d, dlv, gspec, BV)
        return pay_, nb_

    _, nbv = encv(dbv)
    np.asarray(nbv[:4])

    def t_encv(rep):
        dvv = dbv.at[0, 0].set((rep + 1) % 120)
        np.asarray(dvv[0, :4])
        t0 = time.perf_counter()
        _, nbv_ = encv(dvv)
        np.asarray(nbv_[:4])
        return time.perf_counter() - t0

    out["var64k_encode_Bps"] = Nv * BV / best_of(t_encv, reps=2)
    return out


def dryrun_multiprocess(n_procs: int) -> dict:
    """Real jax.distributed group over localhost CPU: the DCN-leg dryrun."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = pathlib.Path(__file__).resolve().parent.parent / "tests" \
        / "multihost_worker.py"
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, str(n_procs),
                 str(i), td],
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            )
            for i in range(n_procs)
        ]
        rcs = [p.wait(timeout=600) for p in procs]
        wall = time.perf_counter() - t0
        if any(rcs):
            err = procs[rcs.index(1)].stderr.read().decode()[-2000:]
            return {"ok": False, "error": err}
        outs = [
            eval((pathlib.Path(td) / f"proc{i}.out").read_text())
            for i in range(n_procs)
        ]
    digests = {o["container.digest"] for o in outs}
    all_ok = all(
        v for o in outs for k, v in o.items() if k.endswith(".ok")
    )
    return {"ok": all_ok and len(digests) == 1, "wall_s": round(wall, 1),
            "identical_containers": len(digests) == 1}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--out", type=pathlib.Path, default=None)
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    doc: dict = {"methodology": __doc__.strip()}

    if not args.skip_tpu:
        import jax

        tpus = [d for d in jax.devices() if d.platform == "tpu"]
        doc["n_tpu_devices_local"] = len(tpus)
        if tpus:
            one = measure_1chip(args.mb)
            doc["per_chip"] = {k: round(v, 1) for k, v in one.items()}
            doc["per_host_aggregate"] = {
                k: round(v * len(tpus), 1) for k, v in one.items()
            }
            for hosts in (2, 4, 16):
                doc[f"projected_{hosts}hosts_{len(tpus)}chip_each"] = {
                    k: round(v * len(tpus) * hosts, 1)
                    for k, v in one.items()
                }
            doc["projection_basis"] = (
                "block data-parallel encode/decode has zero cross-device "
                "communication on the data path; the ordered payload gather "
                "is host-side assembly of compressed bytes (~0.3-0.7x the "
                "input volume) and overlaps the next batch"
            )

    doc["dcn_dryrun"] = {
        f"{n}proc": dryrun_multiprocess(n) for n in (2, 3)
    }

    js = json.dumps(doc, indent=1)
    print(js)
    if args.out:
        args.out.write_text(js + "\n")


if __name__ == "__main__":
    main()
