"""Special-case value-override rules (SURVEY.md §2.3 'special-case value
overrides').

The reference hard-codes a long tail of per-site data fixes in spider code:
missing shop name -> "珉珉上新庄駅前店" (osaka.py:52-56), "<きてみいや>" ->
"　きてみいや" (kochi.py:41-46), genre-missing fallback (fukui.py:47-53),
address city-prefixing (kagoshima.py:71-73), etc.  Keeping these as DATA —
a (source, field, match, replacement) rule table applied in the normalize
stage — makes the quirk tail enumerable and parity-testable instead of
scattered through parser code.

Rule semantics, per row of the items table:
  * rule.source   — prefecture/source name ('*' = every source)
  * rule.field    — item column the rule rewrites
  * rule.match    — exact current value to match; None matches null/missing
  * rule.replace  — new value (may be None)
  * rule.prefix   — alternatively, prepend when value doesn't already start
                    with it (the kagoshima city-prefix shape)
Applied vectorized per batch; first matching rule wins per (field, row).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class OverrideRule:
    source: str  # prefecture name or '*'
    field: str
    match: str | None = None  # exact value (None = null)
    replace: str | None = None
    prefix: str | None = None  # prepend-if-missing mode (ignores match/replace)


# Built-in rules mirroring the reference's quirk tail on the synthetic
# corpus (same SHAPES as the cited fixes; values from our corpus).
BUILTIN_RULES: tuple[OverrideRule, ...] = (
    # kochi.py:41-46 shape: broken display name -> fixed
    OverrideRule(source="jsonapi", field="shop_name", match="<きてみいや>", replace="　きてみいや"),
    # osaka.py:52-56 shape: missing required name -> hard-coded fill
    OverrideRule(source="jsonapi", field="shop_name", match="", replace="珉珉上新庄駅前店"),
    # fukui.py:47-53 shape: genre missing -> fallback value
    OverrideRule(source="jsonapi", field="genre_name", match=None, replace="その他"),
    # kagoshima.py:71-73 shape: bare addresses get the city prefix
    OverrideRule(source="jsonapi", field="address", prefix="鹿児島市"),
)


def apply_overrides(tbl: pa.Table, rules: tuple[OverrideRule, ...] = BUILTIN_RULES) -> pa.Table:
    """Vectorized rule application over an items batch (needs a
    'prefecture' column for source matching; absent columns are skipped)."""
    if "prefecture" not in tbl.column_names or len(tbl) == 0:
        return tbl
    prefectures = tbl.column("prefecture")
    # first-match-wins per (field, row): once a rule rewrites a row's field,
    # later rules must not rematch the produced value
    done: dict[str, pa.Array] = {}
    for rule in rules:
        if rule.field not in tbl.column_names:
            continue
        i = tbl.column_names.index(rule.field)
        col = tbl.column(rule.field)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        src_mask = pc.equal(prefectures, rule.source) if rule.source != "*" else pa.array([True] * len(tbl))
        src_mask = pc.fill_null(src_mask, False)
        already = done.get(rule.field, pa.array([False] * len(tbl)))
        src_mask = pc.and_(src_mask, pc.invert(already))
        if rule.prefix is not None:
            needs = pc.and_(pc.invert(pc.starts_with(pc.fill_null(arr, ""), rule.prefix)), pc.is_valid(arr))
            mask = pc.and_(src_mask, needs)
            new_vals = pc.binary_join_element_wise(pa.array([rule.prefix] * len(tbl)), pc.fill_null(arr, ""), "")
            arr = pc.if_else(mask, new_vals, arr)
        else:
            val_mask = pc.is_null(arr) if rule.match is None else pc.fill_null(pc.equal(arr, rule.match), False)
            mask = pc.and_(src_mask, val_mask)
            arr = pc.if_else(mask, pa.scalar(rule.replace, pa.string()), arr)
        done[rule.field] = pc.or_(already, mask)
        tbl = tbl.set_column(i, rule.field, arr)
    return tbl
