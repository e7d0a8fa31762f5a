"""Chip-gated canary for the worked-around hardware miscompiles.

Runs every standalone repro in sequence on the real chip and reports
which bugs still reproduce.  Each repro exits 0 while the documented
behavior holds (bug present, containment correct) and 1 when behavior
CHANGED — either the toolchain fixed the bug (the matching workaround
can be retired) or the containment itself broke (investigate!).

Workarounds that a green canary would retire:
  1. chunked-scan G>=3 lax.map super-groups
     (`encode_pallas._run_encode_kernel_chunked`)
  2. two-dispatch encode+pack split
     (`encode_pallas.encode_pack_variable_tpu`)
  3. shift|flip/transpose two-dispatch split + pass-2 round segments
     (`decode_pallas.decode_pass2_device`, `_assemble_epochs`)

Usage: python scripts/canary_miscompiles.py
"""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPROS = [
    "repro_miscompile_chunked_scan.py",
    "repro_miscompile_fused_pack.py",
    "repro_miscompile_shift_flip.py",
]


def main():
    changed = []
    for name in REPROS:
        r = subprocess.run(
            [sys.executable, str(HERE / name)],
            capture_output=True, text=True, timeout=1200,
        )
        tail = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(f"{name}: rc={r.returncode}  {tail}")
        if r.returncode != 0:
            changed.append(name)
    if changed:
        print(f"\nBEHAVIOR CHANGED in: {changed} — check whether the "
              f"toolchain fixed the bug (retire the workaround) or the "
              f"containment regressed.")
        return 1
    print("\nAll documented miscompile behaviors unchanged; "
          "workarounds still required.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
