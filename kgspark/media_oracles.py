"""VALUES-based DuckDB oracles for the multimodal (binary-column) operators.

The media corpus is synthesized (kgspark.datagen_media), so expected rows are
computed driver-side from the same deterministic generator and inlined as SQL
``VALUES`` — the driver's DuckDB run then independently re-materializes them
against the Spark results (same mechanism as kgspark.web_oracles).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from . import datagen_media, multimodal

MEDIA_N = 40
MEDIA_SEED = 42


def _cell(v, t: str) -> str:
    if v is None:
        return f"CAST(NULL AS {'VARCHAR' if t == 's' else 'INTEGER'})"
    if t == "s":
        return "'" + str(v).replace("'", "''") + "'"
    return str(int(v))


def _values(rows: list[tuple], cols: list[str], types: list[str]) -> str:
    body = ",\n".join(
        "(" + ", ".join(_cell(c, t) for c, t in zip(r, types)) + ")"
        for r in sorted(rows, key=lambda r: tuple(str(x) for x in r))
    )
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


@lru_cache(maxsize=1)
def build() -> dict[str, str]:
    rows = datagen_media.media_rows(MEDIA_N, MEDIA_SEED)

    meta_rows = []
    decode_rows = []
    frame_rows = []
    for media_id, kind, payload in rows:
        meta_rows.append(
            (media_id, kind, len(payload), hashlib.sha256(payload).hexdigest())
        )
        d = multimodal.decode_header_py(payload)
        decode_rows.append(
            (
                media_id, d["kind"], d["width"], d["height"],
                d["n_samples"], d["n_frames"],
            )
        )
        for fi in multimodal.frame_sample_py(payload):
            frame_rows.append((media_id, fi))

    resize_rows = []
    for media_id, kind, payload in rows:
        r = multimodal.resize_py(payload, 64, 64)
        if r is not None:
            resize_rows.append(
                (
                    media_id, r["kind"], r["src_width"], r["src_height"],
                    r["out_width"], r["out_height"], r["resized_sha256"],
                )
            )

    return {
        "media_resize": _values(
            resize_rows,
            ["media_id", "kind", "src_width", "src_height",
             "out_width", "out_height", "resized_sha256"],
            ["s", "s", "i", "i", "i", "i", "s"],
        ),
        "media_metadata": _values(
            meta_rows,
            ["media_id", "kind", "n_bytes", "payload_sha256"],
            ["s", "s", "i", "s"],
        ),
        "media_decode": _values(
            decode_rows,
            ["media_id", "kind", "width", "height", "n_samples", "n_frames"],
            ["s", "s", "i", "i", "i", "i"],
        ),
        "media_frame_samples": _values(
            frame_rows, ["media_id", "frame_index"], ["s", "i"]
        ),
    }
