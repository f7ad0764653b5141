"""Media side-output: the K2 figure-export sink.

The reference writes one PNG per figure to ``figure_dir`` with deterministic
names (``/root/reference/libpdf/extract.py:647-652,734-754``).  The engine's
analog writes one object per ``media_ref`` under a media root — executed
distributed (each task writes its own batch's objects), idempotent (same ref
→ same path → overwrite), and resumable for free.

No raster codec exists in this container, so payloads are deterministic
placeholder bytes derived from the ref (a real deployment renders the page
crop here); the naming/layout/sink plumbing is the real contract.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd


def _placeholder_png_bytes(media_ref: str) -> bytes:
    """Deterministic fake payload (stable across workers and runs)."""
    digest = hashlib.sha256(media_ref.encode()).digest()
    return b"\x89PNG-STUB\r\n" + digest


class MediaWriter:
    """Actor-pool sink stage: writes each batch's media objects, returns a
    (media_ref, path, n_bytes) manifest row per object."""

    def __init__(self, media_root: str):
        self.media_root = media_root

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        paths, sizes = [], []
        for ref in batch["media_ref"]:
            path = os.path.join(self.media_root, ref)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            payload = _placeholder_png_bytes(ref)
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, path)  # atomic, idempotent on retry
            paths.append(path)
            sizes.append(len(payload))
        return pd.DataFrame(
            {"media_ref": batch["media_ref"], "path": paths, "n_bytes": sizes}
        )


def export_media(spans_ds, media_root: str, batch_size: int = 256):
    """Figure spans → written media objects; returns the manifest Dataset."""
    from ..ops.multimodal import media_table

    return media_table(spans_ds).map_batches(
        MediaWriter,
        fn_constructor_kwargs={"media_root": media_root},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=2,
    )
