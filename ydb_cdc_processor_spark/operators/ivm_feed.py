"""Shared building blocks for incrementally-maintained derived stores
(join view, secondary index) that ride the engines' ``agg_views``
pre-merge old-image feed.

Three things every such store needs, factored out so a fix lands once:

- :class:`Feed` — the adapter binding one maintenance method to the
  duck-typed ``apply_delta(new_rows, old_rows, batch_token)`` protocol;
- :func:`null_safe_key` — the ``\\x00``-sentinel string image of a
  column, used as the store's merge/bucket key (SQL join equality never
  matches NULL, so keying on the raw column would make null-keyed
  upserts INSERT duplicates instead of replacing);
- :func:`stale_keys` — the delta rule shared by every keyed derived
  store: an entry is displaced when its pk has no new row (deleted) or
  its derived key changed (moved), in which case the OLD key's entry
  must be deleted before the new one upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_KEY = "\x00null"   # no cast-to-string of a real value starts with \x00


class Feed:
    """agg_views-protocol adapter (``apply_delta(new, old, token)``).

    ``owner`` is the store the bound method belongs to (None for
    unbound callables) — the status surface inventories it instead of
    reaching into private attributes."""

    def __init__(self, fn):
        self._fn = fn
        self.owner = getattr(fn, "__self__", None)

    def apply_delta(self, new_rows, old_rows, batch_token=None) -> None:
        self._fn(new_rows, old_rows, batch_token)


def null_safe_key(col: str, alias: str) -> F.Column:
    """String image of ``col`` that treats NULL as an ordinary value."""
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_KEY)) \
        .alias(alias)


def stale_keys(old_rows: DataFrame, new_rows: DataFrame | None,
               pk: list[str], key_col: str, key_name: str) -> DataFrame:
    """``(key_name, *pk)`` rows whose store entry is displaced by this
    batch: pks with no new row, or whose derived key changed (the
    null-safe image makes to/from-NULL moves visible)."""
    olds = old_rows.select(null_safe_key(key_col, key_name), *pk)
    if new_rows is None:
        return olds
    news = new_rows.select(
        *[F.col(c).alias(f"_n_{c}") for c in pk],
        null_safe_key(key_col, "_n_key"))
    cond = [F.col(c) == F.col(f"_n_{c}") for c in pk]
    j = olds.join(F.broadcast(news), cond, "left")
    return (j.where(F.col(f"_n_{pk[0]}").isNull()
                    | (F.col("_n_key") != F.col(key_name)))
            .select(key_name, *pk))
