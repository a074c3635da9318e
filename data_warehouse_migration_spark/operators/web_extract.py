"""Web-page text extraction operators: HTML → cleaned text + block/
boilerplate signals, Arrow-batched (functions/html_text is the
parser; this module is the Spark seam).

The production shape: a crawl table carries raw HTML next to typed
metadata; extraction runs as ONE ``mapInPandas`` stage (documents
are the parallelism unit, zero shuffle — the codec posture), and the
cleaned text feeds the existing curation stack (unicode
tokenization, Gopher rules, dedup, BPE) unchanged. The gate harness
(`html_extract_features`) synthesizes deterministic HTML from each
document's own text so a DuckDB oracle can recompute the extraction
by string formula — the synthesize-assets pattern the media gates
use."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_text_from_html(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id",
    link_density_max: float = 0.5,
) -> DataFrame:
    """Production extraction: ``(id, html)`` → ``(id, text, n_blocks,
    n_boilerplate, n_chars)`` in one Arrow-batched stage."""
    from data_warehouse_migration_spark.functions.html_text import (
        boilerplate_stats,
        html_to_text,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                text = html_to_text(h)
                n_blocks, n_boiler = boilerplate_stats(
                    h, link_density_max=link_density_max
                )
                rows.append((int(i), text, n_blocks, n_boiler, len(text)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "text", "n_blocks", "n_boilerplate", "n_chars"],
            )

    return df.select(id_col, html_col).mapInPandas(
        run,
        schema=(
            f"{id_col} bigint, text string, n_blocks int,"
            " n_boilerplate int, n_chars int"
        ),
    )


def html_extract_features(docs: DataFrame) -> DataFrame:
    """Gate harness: per document, SYNTHESIZE a deterministic HTML
    page from its own (doc_id, lang, text) — title, style/script
    raw-text elements with embedded ``<``/``</div>`` traps, the
    body text entity-ESCAPED plus a literal entity suffix
    (``&lt;raw&gt; &#65;&#x42;``), an HTML comment containing fake
    tags, and ``1 + id mod 3`` pure-link nav blocks — then EXTRACT it
    back through the production operator.

    Escape∘decode is the identity on the body text, comments and
    script/style content vanish, and the nav blocks are 100%
    link-density boilerplate, so the extracted text equals::

        Doc {id}\\n{lang}\\n{ws-normalized text} <raw> AB\\nnav 0[...]

    — a pure string formula over the documents table that the DuckDB
    oracle rebuilds with no HTML anywhere. Any defect in quoted-
    attribute scanning (the nav href embeds ``>``), raw-text
    termination, comment skipping, entity decoding, block
    segmentation, or the link-density accounting changes the MD5 or
    the block counts."""
    from data_warehouse_migration_spark.functions.html_text import (
        boilerplate_stats,
        html_to_text,
    )

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, lang, text in zip(pdf["doc_id"], pdf["lang"], pdf["text"]):
                aid = int(i)
                navs = "".join(
                    f'<div><a href="x?a>b&c">nav {j}</a></div>'
                    for j in range(1 + aid % 3)
                )
                page = (
                    f"<html><head><title>Doc {aid}</title>"
                    f"<style>p {{ color: red; }} /* > */</style>"
                    f'<script>if (1 < 2) {{ v = "</div>"; }}</script>'
                    f"</head><body><h1>{lang}</h1>"
                    f"<p>{esc(str(text))} &lt;raw&gt; &#65;&#x42;</p>"
                    f"<!-- <p>not text {aid}</p> -->"
                    f"{navs}</body></html>"
                )
                extracted = html_to_text(page)
                n_blocks, n_boiler = boilerplate_stats(page)
                rows.append(
                    (aid, extracted, n_blocks, n_boiler, len(extracted))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "text", "n_blocks", "n_boilerplate", "n_chars"],
            )

    out = docs.select("doc_id", "lang", "text").mapInPandas(
        run,
        schema=(
            "doc_id bigint, text string, n_blocks int,"
            " n_boilerplate int, n_chars int"
        ),
    )
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_chars",
        "n_blocks",
        "n_boilerplate",
    )
