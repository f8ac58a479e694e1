"""Flatten/merge aggregation — the reference's only aggregation (A1/A2).

``get_flattened_data`` (``dude/base.py:610-622``): sort rows by
``(page_number, group_index, group_id, element_index)``
(``scraped_data.py:14-15``), group by
``(page_number, page_url, group_index, group_id, element_index)``
(``scraped_data.py:18-19``), merge the ``data`` dicts of co-grouped rows
(duplicate keys: later wins — FIXME ``base.py:617``), metadata keys prefixed
``_`` (``base.py:619-620``).

Spark realization: single hash aggregate (Catalyst plans partial+final for
free) — ``collect_list(struct(rule_seq, map_entries(data)))`` →
``array_sort`` (restores the reference's collect order inside each group) →
``flatten`` → later-wins fold into a map. The fold removes any earlier
entry for a key before inserting the later one, so the merged map never
contains duplicate keys and the expression is correct under ANY session's
``spark.sql.mapKeyDedupPolicy`` (the engine must not require a blessed
session factory). No window, no second shuffle; entry lists are tiny
(one entry per rule writing the group), so the O(rules²) fold is noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GROUP_KEYS = ["page_number", "page_url", "group_index", "group_id", "element_index"]
SORT_KEYS = ["_page_number", "_group_index", "_group_id", "_element_index"]


def flatten(extracted: DataFrame, ordered: bool = True) -> DataFrame:
    """extracted (EXTRACT_SCHEMA, kind='data') → flattened output rows.

    Output: ``_page_number, _page_url, _group_id, _group_index,
    _element_index, data map<string,string>`` in the reference's total order.
    ``ordered=False`` skips the global sort (at 100 TB, ordering is only
    meaningful for single-file exports; the sort keys are always present so
    any consumer can order cheaply within partitions).
    """
    merged_entries = F.flatten(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("rule_seq").alias("seq"),
                    F.map_entries("data").alias("entries"),
                )
            )
        ).getField("entries")
    )
    # later-wins fold (base.py:617 dict.update semantics): drop any earlier
    # binding of the key, then append the new one — duplicate-free by
    # construction, independent of mapKeyDedupPolicy
    merged_map = F.aggregate(
        merged_entries,
        F.create_map().cast("map<string,string>"),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _: k != e["key"]),
            F.create_map(e["key"], e["value"]),
        ),
    )
    df = (
        extracted.filter(F.col("kind") == "data")
        .groupBy(*GROUP_KEYS)
        .agg(merged_map.alias("data"))
        .select(
            F.col("page_number").alias("_page_number"),
            F.col("page_url").alias("_page_url"),
            F.col("group_id").alias("_group_id"),
            F.col("group_index").alias("_group_index"),
            F.col("element_index").alias("_element_index"),
            "data",
        )
    )
    if ordered:
        df = df.orderBy(*SORT_KEYS)
    return df


def csv_header_union(flattened: DataFrame) -> list[str]:
    """A2 (``storage.py:70-81``): sorted union of all data keys + meta keys."""
    keys = (
        flattened.select(F.explode(F.map_keys("data")).alias("k"))
        .distinct()
        .collect()
    )
    meta = ["_element_index", "_group_id", "_group_index", "_page_number", "_page_url"]
    return sorted({r["k"] for r in keys} | set(meta))


def pivot_data(flattened: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Map → typed columns (CSV/relational export). Key union computed
    distributively when not supplied."""
    if keys is None:
        keys = [k for k in csv_header_union(flattened) if not k.startswith("_")]
    meta = ["_page_number", "_page_url", "_group_id", "_group_index", "_element_index"]
    return flattened.select(
        *meta, *[F.col("data").getItem(k).alias(k) for k in keys]
    )
