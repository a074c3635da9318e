"""SCD Type 2 dimension maintenance — the reference's hardest component.

Two entry points:

- :func:`scd2_merge` — snapshot-driven merge, the Spark-first rewrite of
  ``adf/dataflow/DF_SCD2_Customer.json``: hash-compare the incoming
  snapshot against the *active* dim versions, route NEW / CHANGED /
  NO-CHANGE, expire changed versions and append new ones. The
  reference does this with two *ordered* JDBC sinks (update then
  insert, ``DF_SCD2_Customer.json:197,215``) and a documented
  corruption window (``docs/technical_report.md:251``); here the whole
  next dim state is computed as ONE DataFrame and swapped atomically by
  the writer (stage-to-temp + rename), so there is no partial state.
  Also fixes the reference's latent bug: its existing-dim read does not
  filter ``IsActive`` while ``lookup(multiple:false)`` picks an
  arbitrary version (``DF_SCD2_Customer.json:120-132``; SURVEY.md §7.1)
  — we join against active versions only.

- :func:`scd2_from_history` — backfill: collapse a full change-event
  history into version rows with window functions (``lag`` to detect
  change, ``lead`` to close intervals) — the classical formulation the
  reference's lookup+split encoding approximates one batch at a time.

100 TB posture: both are single-shuffle-per-window/join operators keyed
on the business key; no driver-side loops, no collect. ``scd2_merge``
broadcasts nothing by default (dim and snapshot can both be large) —
AQE picks BHJ when the active-dim side is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.jde import row_hash

#: SCD2 metadata columns added by these operators.
SCD2_COLS = ["RowHash", "ValidFrom", "ValidTo", "IsActive"]


def scd2_from_history(
    history: DataFrame,
    keys: str | list[str],
    attrs: list[str],
    ts: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse a change-event history into SCD2 version rows.

    Keeps one row per run of consecutive identical attribute hashes per
    key; ``ValidFrom`` = first event time of the run, ``ValidTo`` = next
    version's ``ValidFrom`` (NULL for the current version),
    ``IsActive`` = open-ended. A→B→A yields three versions (true
    temporal semantics, not dedup).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts), *[F.col(c) for c in (tiebreak or [])]]
    w = Window.partitionBy(*keys).orderBy(*order)

    hashed = history.withColumn("RowHash", row_hash(*attrs))
    starts = hashed.withColumn("__prev", F.lag("RowHash").over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("RowHash"))
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        starts.withColumn("ValidFrom", F.col(ts))
        .withColumn("ValidTo", F.lead("ValidFrom").over(w2))
        .withColumn("IsActive", F.col("ValidTo").isNull())
        .drop("__prev")
    )


def scd2_merge(
    dim: DataFrame | None,
    snapshot: DataFrame,
    keys: str | list[str],
    attrs: list[str],
    now,
    first_version_from=None,
) -> DataFrame:
    """One SCD2 maintenance round: current dim + snapshot → next dim.

    ``dim`` may be ``None`` (initial load). ``now`` is the effective
    timestamp Column/literal for this batch (inject it — don't call
    ``current_timestamp()`` inside, so runs are reproducible and
    testable; reference stamps ``currentUTC()``,
    ``DF_SCD2_Customer.json:156-157``).

    Routing (reference's conditional split, ``DF_SCD2_Customer.json:
    148-152``): NEW (key absent from active dim) and CHANGED (hash
    differs) get fresh open versions; CHANGED additionally expires the
    old active version (``ValidTo=now, IsActive=false``); NO-CHANGE and
    all already-expired history pass through untouched.

    ``first_version_from``: effective-from for a key's FIRST version
    (both initial load and later-arriving new keys). The reference
    stamps load time (``SYSUTCDATETIME()``, dim_customer.sql:35), which
    silently un-attributes facts dated before the load in the PIT join
    (``OrderDate >= ValidFrom``, fact_sales.sql:12) — a latent
    data-loss bug we don't replicate. Kimball practice: the first
    version covers all history — pass a low sentinel (e.g.
    ``datetime(1900,1,1)``). Default ``None`` keeps the reference's
    load-time semantics.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    now = now if isinstance(now, Column) else F.lit(now)
    first_from = (
        now
        if first_version_from is None
        else (
            first_version_from
            if isinstance(first_version_from, Column)
            else F.lit(first_version_from)
        )
    )

    snap = snapshot.select(*keys, *attrs).withColumn("RowHash", row_hash(*attrs))

    if dim is None:
        return (
            snap.withColumn("ValidFrom", first_from.cast("timestamp"))
            .withColumn("ValidTo", F.lit(None).cast("timestamp"))
            .withColumn("IsActive", F.lit(True))
        )

    active = dim.filter(F.col("IsActive"))
    inactive = dim.filter(~F.col("IsActive"))

    # Route the snapshot against active versions on the business key.
    lookup = active.select(*keys, F.col("RowHash").alias("__cur_hash"))
    routed = snap.join(lookup, keys, "left")
    incoming = routed.filter(
        F.col("__cur_hash").isNull() | (F.col("__cur_hash") != F.col("RowHash"))
    )
    new_versions = (
        incoming.withColumn(
            "ValidFrom",
            F.when(F.col("__cur_hash").isNull(), first_from.cast("timestamp"))
            .otherwise(now.cast("timestamp")),
        )
        .drop("__cur_hash")
        .withColumn("ValidTo", F.lit(None).cast("timestamp"))
        .withColumn("IsActive", F.lit(True))
    )

    # Expire active versions whose key arrived with a different hash.
    changed_keys = incoming.filter(F.col("__cur_hash").isNotNull()).select(*keys)
    expired = (
        active.join(changed_keys, keys, "left_semi")
        .withColumn("ValidTo", now.cast("timestamp"))
        .withColumn("IsActive", F.lit(False))
    )
    surviving_active = active.join(changed_keys, keys, "left_anti")

    out_cols = [*keys, *attrs, *SCD2_COLS]
    return (
        inactive.select(out_cols)
        .unionByName(expired.select(out_cols))
        .unionByName(surviving_active.select(out_cols))
        .unionByName(new_versions.select(out_cols))
    )


def assign_surrogate_keys(
    dim: DataFrame,
    key_col: str,
    order_by: list[str],
    start_at: int = 1,
) -> DataFrame:
    """Deterministic dense surrogate keys (the reference's
    ``IDENTITY(1,1)``, ``dim_customer.sql:23``).

    ``row_number`` over a single global ordering — exact IDENTITY
    semantics, but a one-partition sort at the very end. Acceptable for
    dimension tables (even at 100 TB of *facts*, dims are ≤ billions of
    rows and this is a one-column sort); for fact-scale surrogate keys
    use ``monotonically_increasing_id`` (non-contiguous, no shuffle) or
    ``zipWithIndex`` instead. SURVEY.md §7.2 documents the trade.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return dim.withColumn(key_col, F.row_number().over(w) + F.lit(start_at - 1))


def snapshot_diff(
    old: DataFrame | None,
    new: DataFrame,
    keys: str | list[str],
    attrs: list[str],
) -> DataFrame:
    """CDC-style diff of two table snapshots: one row per key present
    in either side, labeled ``change ∈ {INSERT, DELETE, UPDATE,
    UNCHANGED}`` by key existence + attribute-hash comparison — the
    feed for SCD2 maintenance (``scd2_merge`` consumes the INSERT/
    UPDATE lanes) or for replicating into an external sink
    (``sources/external.upsert_rows``).

    One full-outer join keyed on the business key; hashes compare a
    single column instead of N attributes (the reference's
    change-detection trick, DF_SCD2_Customer.json:134-140). New-side
    attribute values are emitted for INSERT/UPDATE/UNCHANGED, old-side
    for DELETE.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    o = (
        old.select(*keys, *attrs).withColumn("__oh", row_hash(*attrs))
        if old is not None
        else None
    )
    n = new.select(*keys, *attrs).withColumn("__nh", row_hash(*attrs))
    if o is None:
        return n.select(
            *keys, *attrs, F.lit("INSERT").alias("change")
        )

    o_ren = o.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(a).alias(f"__oa_{a}") for a in attrs],
        "__oh",
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (n[k].eqNullSafe(F.col(f"__ok_{k}")))
    joined = n.join(o_ren, cond, "full_outer")

    change = (
        F.when(F.col("__oh").isNull(), F.lit("INSERT"))
        .when(F.col("__nh").isNull(), F.lit("DELETE"))
        .when(F.col("__nh") != F.col("__oh"), F.lit("UPDATE"))
        .otherwise(F.lit("UNCHANGED"))
    )
    out_keys = [
        F.coalesce(n[k], F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    # Select attrs by lane, not coalesce: an UPDATE that sets an
    # attribute to NULL must emit NULL, not the stale old value.
    out_attrs = [
        F.when(F.col("__nh").isNull(), F.col(f"__oa_{a}"))
        .otherwise(n[a])
        .alias(a)
        for a in attrs
    ]
    return joined.select(*out_keys, *out_attrs, change.alias("change"))


def inferred_members(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    defaults: dict[str, object],
) -> DataFrame:
    """Late-arriving-dimension stubs (Kimball "inferred members"): one
    placeholder dim row per fact key missing from the dimension, so
    fact loads never drop rows or violate FK semantics when the
    dimension feed lags the fact feed.

    The stub carries the business key + caller-supplied defaults and an
    ``IsInferred`` flag; when the real dimension row finally arrives,
    :func:`scd2_merge` sees a hash change and versions it normally —
    the stub becomes the (correctly dated) first version's predecessor.

    Scale: one distinct + one left-anti join, both keyed on the
    business key; no fact payload moves — only keys.
    """
    missing = (
        facts.select(key).distinct().join(dim.select(key), key, "left_anti")
    )
    stub = missing
    for col_name, value in defaults.items():
        stub = stub.withColumn(col_name, F.lit(value))
    return stub.withColumn("IsInferred", F.lit(True))
