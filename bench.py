"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): fixed-12-bit LZW encode throughput on the
image corpus, block-parallel on the TPU chip, in uncompressed bytes/s (the
reference's definition, `README.md:16-19`).

Measurement is HBM-to-HBM (input blocks resident on device, compressed
payload matrix + lengths produced on device), which is the apples-to-apples
equivalent of the reference's RAM-to-RAM criterion benches
(`lzw/benches/compare_crates.rs:31-38` reuses in-memory buffers).  This dev
environment reaches the chip through a ~16 MB/s loopback relay, so any
host-transfer-inclusive number measures the tunnel, not the codec; production
TPU hosts stream via local DMA.  The end-to-end container rate through the
relay is still printed to stderr for reference.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ASSETS = pathlib.Path(__file__).resolve().parent / "test-assets"
BASELINE_FIXED12_ENCODE = 120 * (1 << 20)  # bytes/s, reference README.md:27
BASELINE_FIXED12_DECODE = 210 * (1 << 20)  # bytes/s, reference README.md:28
BASELINE_VAR_ENCODE = 70 * (1 << 20)       # bytes/s, reference README.md:27
BASELINE_VAR_DECODE = 200 * (1 << 20)      # bytes/s, reference README.md:28
CORPUS_MB = 32


def _corpus(target_bytes: int) -> bytes:
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    base = load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")
    reps = max(1, target_bytes // len(base) + 1)
    return (base * reps)[:target_bytes]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lzw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lzw_tpu.kernels import encode_pallas
    from lzw_tpu.parallel.block import BlockParallelCodec
    from lzw_tpu.spec import Endianness, LzwSpec

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    n_dev = len(jax.devices())
    note(f"devices: {n_dev}")
    spec = LzwSpec.fixed(Endianness.LITTLE)
    B = encode_pallas.BLOCK_SIZE

    data = _corpus(CORPUS_MB << 20)
    N = len(data) // B
    blocks = np.frombuffer(data, np.uint8)[: N * B].reshape(N, B)
    lens = np.full(N, B, np.int32)

    if any(d.platform == "tpu" for d in jax.devices()):
        f = jax.jit(
            lambda b, l: encode_pallas.encode_blocks_fixed_tpu(
                b, l, B, compact="stage"
            )
        )
    else:  # CPU fallback: exercise the portable path on a small corpus
        data = data[: 4 << 20]
        N = len(data) // B
        blocks = blocks[:N]
        lens = lens[:N]
        codec = BlockParallelCodec(spec, block_size=B, use_pallas=False)
        f = None

    if f is not None:
        note("uploading corpus (4 MiB chunks; large single transfers crawl "
             "through the dev relay, and its throughput varies — stop at a "
             "deadline and bench whatever made it on device)")
        from lzw_tpu.kernels.encode_pallas import GROUP

        CHUNK_ROWS = (4 << 20) // B
        UPLOAD_DEADLINE_S = 120.0
        t_up = time.perf_counter()
        parts = []
        rows = 0
        for i in range(0, N, CHUNK_ROWS):
            p = jnp.asarray(blocks[i : i + CHUNK_ROWS])
            np.asarray(p[0, :4])  # force each chunk (block_until_ready is
            # asynchronous through the dev relay; only host fetches sync)
            parts.append(p)
            rows += p.shape[0]
            if (time.perf_counter() - t_up > UPLOAD_DEADLINE_S
                    and rows >= CHUNK_ROWS):
                note(f"upload deadline hit at {rows} blocks")
                break
        # The timed workload is FIXED at CORPUS_MB by tiling device-side:
        # the headline must not depend on how much the dev relay managed to
        # upload (r2 regression: an 8 MiB upload left one kernel group where
        # fixed overheads dominate).  The host corpus is itself the base
        # image repeated, so tiling changes nothing about content.
        N_target = (CORPUS_MB << 20) // B
        up = jnp.concatenate(parts, axis=0)
        if rows < N_target:
            reps_tile = -(-N_target // rows)
            up = jnp.tile(up, (reps_tile, 1))
        N = (N_target // GROUP) * GROUP
        db = up[:N]
        dl = jnp.asarray(lens[:N])
        np.asarray(db[0, :4])
        note(f"corpus on device: {N * B / 2**20:.0f} MiB "
             f"(uploaded {rows * B / 2**20:.0f} MiB, tiled; "
             f"{time.perf_counter() - t_up:.0f}s)")
        note("compiling main batch shape")
        bufs, lengths = f(db, dl)
        np.asarray(lengths)
        note("compiled; timing")
        best = float("inf")
        for rep in range(3):
            # Device-side one-byte perturbation defeats any execution
            # caching without re-uploading the corpus; the timed region ends
            # at a small host fetch, which is what actually synchronizes.
            dvar = db.at[0, 0].set((rep + 1) % 251)
            np.asarray(dvar[0, :4])
            t0 = time.perf_counter()
            bufs, lengths = f(dvar, dl)
            np.asarray(lengths)
            best = min(best, time.perf_counter() - t0)
            note(f"rep {rep}: {time.perf_counter() - t0:.3f}s")
        rate = N * B / best

        note(f"timed: {best:.3f}s best-of-3")

        # --- secondary metrics on the resident corpus ---------------------
        # Workload sizes are fixed by tiling the device-resident corpus, so
        # the numbers don't depend on how much the relay managed to upload.
        extra = {}
        try:  # all-device fixed-12 decode (pass 1 + chain-walk pass 2)
            from lzw_tpu.kernels import decode_pallas as _dp

            Nd = _dp.GROUP
            if True:
                reps_d = -(-Nd // N)
                db_d = jnp.tile(db, (reps_d, 1))[:Nd] if reps_d > 1 \
                    else db[:Nd]
                bufs_d, len_d = f(db_d, jnp.full((Nd,), B, jnp.int32))
                # Trim to the actual compressed bound (the kernel's VMEM
                # scratch scales with the code-slot count).
                pb_act = int(np.asarray(jnp.max(len_d)))
                PB3 = ((pb_act + 2) // 3) * 3
                if PB3 <= bufs_d.shape[1]:
                    pay = bufs_d[:, :PB3]
                else:
                    pay = jnp.pad(
                        bufs_d, ((0, 0), (0, PB3 - bufs_d.shape[1]))
                    )

                # Stride-2 walk on sorted lanes (r5; fixed blocks all
                # decode 4096 bytes, so sorting by code count aligns the
                # lockstep word trajectories and is free to undo).  NOT
                # one outer jit: pass 2 must stay its own dispatches (the
                # r4 shift/flip fusion containment).
                def _dec(pay_, nb_):
                    order = jnp.argsort(nb_).astype(jnp.int32)
                    inv = jnp.argsort(order).astype(jnp.int32)
                    ps = jnp.take(pay_, order, axis=0)
                    nbs = jnp.take(nb_, order)
                    w, nc, tot, de, dec_, (pair, codes) = (
                        _dp.decode_pass1_fixed_tpu(
                            ps, nbs, B, little=True, pair2=True
                        )
                    )
                    out = _dp.decode_pass2_stride2(
                        codes, pair, nc, tot, B, seg=32, first_free=256
                    )
                    return (jnp.take(out, inv, axis=0),
                            jnp.take(tot, inv), jnp.take(de, inv))

                out_d, tot_d, _ = _dec(pay, len_d)
                np.asarray(tot_d[:4])
                bestd = float("inf")
                for rep in range(3):
                    pvar = pay.at[0, 0].set(rep % 251)
                    np.asarray(pvar[0, :4])
                    t0 = time.perf_counter()
                    out_d, tot_d, _ = _dec(pvar, len_d)
                    np.asarray(tot_d[:4])
                    bestd = min(bestd, time.perf_counter() - t0)
                # Round-trip gate on EVERY unperturbed row (sparse
                # corruption hides from partial asserts — r4 find).
                assert (np.asarray(out_d[1:])
                        == np.asarray(db_d[1:])).all(), "decode mismatch"
                drate = Nd * B / bestd
                extra["fixed12_decode_bytes_per_s_1chip"] = round(drate, 1)
                extra["fixed12_decode_vs_baseline"] = round(
                    drate / BASELINE_FIXED12_DECODE, 4
                )
                note(f"decode all-device: {drate/2**20:.1f} MiB/s "
                     f"({drate/BASELINE_FIXED12_DECODE:.2f}x reference)")
        except Exception as e:  # pragma: no cover - report, don't fail bench
            note(f"decode metric skipped: {e!r}")

        try:  # default-container config: variable gif7, 64 KiB chunked
            from lzw_tpu.kernels import encode_pallas as _ep, schedule as _sc
            from lzw_tpu.spec import LzwSpec

            gspec = LzwSpec.gif(7)
            BV = 1 << 16
            Nv = 2048  # 128 MiB workload (2 x GROUP_CHUNKED: one sliced execution)
            if Nv:
                reps_v = -(-(Nv * BV) // (N * B))
                flat = jnp.tile(db.reshape(-1), reps_v) if reps_v > 1 \
                    else db.reshape(-1)
                dbv = (flat[: Nv * BV] % 128).reshape(Nv, BV)
                dlv = jnp.full((Nv,), BV, jnp.int32)

                # TWO dispatches, not one jit: the fused encode+pack
                # program mis-packs on hardware (encode_pack_variable_tpu
                # docstring has the r3 find; round-trip gate below).
                def _envc(d):
                    bufs_v, nb_v_, _, _ = _ep.encode_pack_variable_tpu(
                        d, dlv, gspec, BV
                    )
                    return bufs_v, nb_v_

                _, nbv = _envc(dbv)
                np.asarray(nbv[:4])
                bestv = float("inf")
                for rep in range(2):
                    dvv = dbv.at[0, 0].set((rep + 1) % 120)
                    np.asarray(dvv[0, :4])
                    t0 = time.perf_counter()
                    _, nbv = _envc(dvv)
                    np.asarray(nbv[:4])
                    bestv = min(bestv, time.perf_counter() - t0)
                vrate = Nv * BV / bestv
                extra["var64k_encode_bytes_per_s_1chip"] = round(vrate, 1)
                extra["var64k_encode_vs_baseline"] = round(
                    vrate / BASELINE_VAR_ENCODE, 4
                )
                note(f"variable 64 KiB encode: {vrate/2**20:.1f} MiB/s "
                     f"({vrate/BASELINE_VAR_ENCODE:.2f}x reference)")

                # Default-container decode, all on device (pass 1 two-plane
                # tables + chain-walk pass 2).  Host count recovery runs
                # once outside the timed region (in production it is a few
                # byte reads per stream; here it would measure the relay).
                from lzw_tpu.kernels import decode_pallas as _dpv

                pay_v, nb_v = _envc(dbv)
                pb_v = int(np.asarray(jnp.max(nb_v)))
                pay_v = pay_v[:, :pb_v]
                nb_np = np.asarray(nb_v)
                counts_v, strict_v, sched_v, S_v = (
                    _dpv.prepare_variable_decode(
                        np.asarray(pay_v), nb_np, gspec
                    )
                )
                assert strict_v.all(), "self-streams must be strict"
                cdev = jnp.asarray(counts_v.astype(np.int32))

                def _devc(p, c):
                    out, tot, errs_, _, ok_ = (
                        _dpv.decode_variable_epochs_pooled(
                            p, c, sched_v, gspec, S_v, BV
                        )
                    )
                    return out, tot

                out_v, tot_v = _devc(pay_v, cdev)
                # Round-trip gate on EVERY row of the unrolled batch (the
                # r4 shift/flip fusion find showed sparse corruption can
                # hide from single-row asserts).
                assert (np.asarray(out_v) == np.asarray(dbv)).all(), \
                    "var decode mismatch"
                bvd = float("inf")
                for rep in range(2):
                    # Roll whole rows on device (payloads/counts stay
                    # aligned) to defeat the relay's execution cache.
                    pv = jnp.roll(pay_v, rep + 1, axis=0)
                    cv = jnp.roll(cdev, rep + 1)
                    np.asarray(pv[0, :4])
                    t0 = time.perf_counter()
                    out_v, tot_v = _devc(pv, cv)
                    np.asarray(tot_v[:4])
                    bvd = min(bvd, time.perf_counter() - t0)
                # And a spot gate after the last roll (shift 2): decoded
                # row 1 must equal source block (1 - 2) mod Nv.
                k = (1 - 2) % Nv
                assert (np.asarray(out_v[1]) ==
                        np.asarray(dbv[k])).all(), "var decode mismatch"
                vdrate = Nv * BV / bvd
                extra["var64k_decode_device_bytes_per_s_1chip"] = round(
                    vdrate, 1
                )
                extra["var64k_decode_device_vs_baseline"] = round(
                    vdrate / BASELINE_VAR_DECODE, 4
                )
                note(f"variable 64 KiB decode (all-device): "
                     f"{vdrate/2**20:.1f} MiB/s "
                     f"({vdrate/BASELINE_VAR_DECODE:.2f}x reference)")

                # The container's DEFAULT 64 KiB decode: device pass 1 +
                # threaded native apply_words (BlockParallelCodec's route
                # when the native runtime is loaded).  Stage sum; the
                # words-matrix pull crosses this dev rig's ~16 MB/s relay
                # and is excluded (production hosts stream via local DMA)
                # — methodology matches the tpu-hybrid rows in
                # benchmarks/results_r4.jsonl.
                from lzw_tpu.native.runtime import get_runtime as _grt

                _rt = _grt()
                _group1 = 1024

                def _p1(p, c):
                    words_, stats_, _pr, _dn, _ok = (
                        _dpv._variable_pass1_from_payloads(
                            p, c, jnp.asarray(sched_v), gspec, S_v, BV,
                            False, _group1, _dpv.CELL, 128,
                        )
                    )
                    return words_, stats_

                wv, sv = _p1(pay_v, cdev)
                np.asarray(sv[:2, :2])
                besth = None
                for rep in range(2):
                    pv = jnp.roll(pay_v, rep + 1, axis=0)
                    cv = jnp.roll(cdev, rep + 1)
                    np.asarray(pv[0, :4])
                    t0 = time.perf_counter()
                    wv, sv = _p1(pv, cv)
                    np.asarray(sv[:2, :2])
                    t_p1 = time.perf_counter() - t0
                    w_np = np.asarray(wv)  # relay pull (excluded)
                    t0 = time.perf_counter()
                    outs_h, tl_h = _rt.apply_words(w_np, BV)
                    t_ap = time.perf_counter() - t0
                    if besth is None or t_p1 + t_ap < besth[0]:
                        besth = (t_p1 + t_ap, t_p1, t_ap)
                    kh = (0 - (rep + 1)) % Nv
                    assert (outs_h[0, : tl_h[0]] ==
                            np.asarray(dbv[kh])).all(), "hybrid mismatch"
                hrate = Nv * BV / besth[0]
                extra["var64k_decode_bytes_per_s_1chip"] = round(hrate, 1)
                extra["var64k_decode_vs_baseline"] = round(
                    hrate / BASELINE_VAR_DECODE, 4
                )
                extra["var64k_decode_note"] = (
                    "container default: device pass1 + threaded native "
                    "apply_words, stage sum (pass1 "
                    f"{besth[1]:.3f}s + apply {besth[2]:.3f}s), relay "
                    "pull excluded; all-device rate reported separately"
                )
                note(f"variable 64 KiB decode (container default, "
                     f"pass1+apply): {hrate/2**20:.1f} MiB/s "
                     f"({hrate/BASELINE_VAR_DECODE:.2f}x reference)")
        except Exception as e:  # pragma: no cover
            note(f"variable-64k metric skipped: {e!r}")

        try:  # text corpus (reference anchors: encode 85, decode 220 MiB/s)
            txt = (ASSETS / "lorem_ipsum.txt").read_bytes()
            tx = jnp.asarray(np.frombuffer(txt, np.uint8))
            reps_t = -(-(N * B) // len(txt))
            dbt = jnp.tile(tx, reps_t)[: N * B].reshape(N, B)
            np.asarray(dbt[0, :4])
            bufs_t, nb_t = f(dbt, dl)
            np.asarray(nb_t[:4])
            bt = float("inf")
            for rep in range(2):
                dvt = dbt.at[0, 0].set((rep + 7) % 251)
                np.asarray(dvt[0, :4])
                t0 = time.perf_counter()
                bufs_t, nb_t = f(dvt, dl)
                np.asarray(nb_t[:4])
                bt = min(bt, time.perf_counter() - t0)
            trate = N * B / bt
            extra["fixed12_encode_text_bytes_per_s_1chip"] = round(trate, 1)
            extra["fixed12_encode_text_vs_baseline"] = round(
                trate / (85 * (1 << 20)), 4
            )
            note(f"text encode: {trate/2**20:.1f} MiB/s "
                 f"({trate/(85*(1<<20)):.2f}x reference)")
        except Exception as e:  # pragma: no cover
            note(f"text metric skipped: {e!r}")
        # Correctness gate: container round-trip on a slice through the full
        # host pipeline, decoded with the independent native runtime; the
        # per-batch verify sample is on (hardware default made explicit).
        codec = BlockParallelCodec(spec, block_size=B, verify=True)
        slice_ = data[: B * 64 + 123]
        codec.encode(slice_)  # compile the e2e batch shape
        t0 = time.perf_counter()
        container = codec.encode(slice_)
        e2e = time.perf_counter() - t0
        from lzw_tpu.native.runtime import get_runtime
        from lzw_tpu.parallel import framing

        _, payloads = framing.parse_frame(container)
        out = get_runtime().decode_blocks(
            [bytes(p) for p in payloads], spec, B
        )
        assert out == slice_, "round-trip mismatch"
        note("round-trip gate passed")
        e2e_rate = len(slice_) / e2e
    else:
        t0 = time.perf_counter()
        container = codec.encode(data)
        best = time.perf_counter() - t0
        rate = e2e_rate = len(data) / best
        extra = {}

    result = {
        "metric": "fixed12_encode_bytes_per_s_1chip",
        "value": round(rate, 1),
        "unit": "bytes/s",
        "vs_baseline": round(rate / BASELINE_FIXED12_ENCODE, 4),
    }
    if extra:
        result["extra"] = extra
    print(json.dumps(result))
    print(
        f"# {N*B/2**20:.0f} MiB HBM-to-HBM in {best:.3f}s = "
        f"{rate/2**20:.1f} MiB/s ({rate/BASELINE_FIXED12_ENCODE:.2f}x "
        f"reference single-core); container e2e through dev relay: "
        f"{e2e_rate/2**20:.1f} MiB/s; {n_dev} device(s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
