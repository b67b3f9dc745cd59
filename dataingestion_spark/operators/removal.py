"""RemovalProcessor: drop elements by predicate, with empty-section cascade.

Reference semantics (``src/.../Processors/RemovalProcessor.cs:13-67``): the
tree is rebuilt without elements matching a predicate, and sections are
re-checked *after* their children were removed, so a section left empty (at
any depth) cascades away. Presets: Footers, EmptySections.

Relationally, removal by predicate is just ``filter``. The cascade needs no
iteration: a section survives iff at least one *leaf* (non-section) element
survives anywhere beneath it. Every leaf explodes its ancestor-path prefixes
(bounded by tree depth, single-digit) and sections are kept via a semi-join
on those prefixes — shuffle on (doc_id, path), no driver loop, no recursion,
scales linearly with element count.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import ELEM_FOOTER, ELEM_SECTION

_PATH = "section_path"


def _path_str(col) -> Column:
    return F.array_join(col, "/")


def remove_elements(elements_df, should_remove: Column, cascade_empty_sections: bool = True):
    """Drop leaf elements matching ``should_remove``; optionally cascade away
    sections left without any leaf descendant."""
    is_section = F.col("elem_type") == ELEM_SECTION
    # coalesce: a predicate that evaluates NULL (e.g. comparing a nullable
    # markdown column) must mean "keep", not three-valued-logic "drop"
    kept = elements_df.filter(is_section | ~F.coalesce(should_remove, F.lit(False)))
    if not cascade_empty_sections:
        return kept

    leaves = kept.filter(F.col("elem_type") != ELEM_SECTION)
    # Each leaf's ancestors: all strict prefixes of its section_path.
    ancestor_keys = (
        leaves.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(_PATH) - 1),
                    lambda i: F.array_join(F.slice(F.col(_PATH), F.lit(1), i), "/"),
                )
            ).alias("path_str"),
        )
        .distinct()
    )
    sections = kept.filter(is_section).withColumn("path_str", _path_str(F.col(_PATH)))
    kept_sections = sections.join(ancestor_keys, ["doc_id", "path_str"], "left_semi").drop("path_str")
    return kept_sections.unionByName(leaves)


def remove_footers(elements_df, cascade_empty_sections: bool = False):
    """Preset: drop footer elements (RemovalProcessor.Footers)."""
    return remove_elements(
        elements_df, F.col("elem_type") == ELEM_FOOTER, cascade_empty_sections
    )


def remove_empty_sections(elements_df):
    """Preset: drop sections with no remaining leaf content, cascading
    (RemovalProcessor.EmptySections + recursive re-check)."""
    return remove_elements(elements_df, F.lit(False), cascade_empty_sections=True)
