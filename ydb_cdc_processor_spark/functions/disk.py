"""One directory-size walk for every consumer.

The JoinView broadcast cap, the /stores endpoint, and the growth tools
all need "how big is this store on disk" — a recursive walk that every
copy was re-deciding edge cases for independently (review finding).
Shared rules, decided once:

- dot-prefixed entries are SKIPPED: staging siblings (``.name.tmp-*``,
  ``.name.old``, ``.name.snapshots``) and hidden files are transient or
  non-data, and counting a mid-rebuild staged duplicate would
  double-report size (and could trip the JoinView broadcast cap
  spuriously);
- files racing away mid-walk (a concurrent swap) are tolerated — a
  size probe must never crash the thing it observes;
- ``suffix`` filters to data files (".parquet") where metadata/token
  files shouldn't count (the JoinView cap); None counts everything
  (capacity reporting).
"""

from __future__ import annotations

import os

from ydb_cdc_processor_spark import storage


def disk_usage(path: str | None, suffix: str | None = None) -> tuple[int, int]:
    """``(n_files, total_bytes)`` under ``path`` (0, 0 if None/absent)."""
    n = b = 0
    if not path:
        return 0, 0
    for root, dirs, files in storage.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if f.startswith("."):
                continue
            if suffix is not None and not f.endswith(suffix):
                continue
            try:
                b += storage.file_size(os.path.join(root, f))
                n += 1
            except OSError:
                pass   # file raced away mid-walk (concurrent swap)
    return n, b
