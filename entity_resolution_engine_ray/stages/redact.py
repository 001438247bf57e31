"""PII-redaction stage for training-corpus export.

A web corpus gets scrubbed of emails / phone numbers / IP addresses / ID
numbers before it becomes training data. This stage is a stateless
``map_batches`` transform over Arrow batches — the RE2 kernels in
``functions.textstats.redact_pii`` do all the work vectorized, so it
pipelines with the rest of an export without a shuffle and scales linearly
with input bytes. Custom pattern sets (compiled once per task closure, not
per batch) slot in via ``patterns=``.
"""

from __future__ import annotations

import pyarrow as pa

from entity_resolution_engine_ray.functions.textstats import redact_pii


def redact_stage(
    ds,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
    count_col: str = "n_redacted",
):
    """``(…, text)`` → same rows with the text scrubbed (in place, or into
    ``out_col`` if given) plus an int64 ``count_col`` of redacted spans —
    the per-doc audit number an export manifest wants."""

    def scrub(t: pa.Table) -> pa.Table:
        red, counts = redact_pii(t[text_col], patterns)
        dest = out_col or text_col
        if dest in t.column_names:
            t = t.set_column(t.column_names.index(dest), dest, red)
        else:
            t = t.append_column(dest, red)
        return t.append_column(count_col, pa.array(counts))

    return ds.map_batches(scrub, batch_format="pyarrow")
