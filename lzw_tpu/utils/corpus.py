"""Benchmark corpus loading.

The reference benches on two corpora (`lzw/benches/compare_crates.rs:4-16`):
the lorem_ipsum text and the indexed pixel plane of tokyo_128_colors.png
(values 0..128, hence code size 7), decoded via the `png` crate at
`compare_crates.rs:276-287`.  We produce the identical byte stream from the
palette indices.
"""

from __future__ import annotations

import pathlib

__all__ = ["load_tokyo_pixels", "load_corpus"]


def load_tokyo_pixels(path: str | pathlib.Path) -> bytes:
    """Decode an indexed PNG to its raw palette-index bytes."""
    from PIL import Image

    with Image.open(path) as img:
        if img.mode != "P":
            raise ValueError(f"expected a palette PNG, got mode {img.mode}")
        return img.tobytes()


def load_corpus(assets_dir: str | pathlib.Path) -> dict[str, bytes]:
    """Load the benchmark corpora keyed by the reference's bench names."""
    assets = pathlib.Path(assets_dir)
    return {
        "lorem_ipsum": (assets / "lorem_ipsum.txt").read_bytes(),
        "tokyo": load_tokyo_pixels(assets / "tokyo_128_colors.png"),
    }
