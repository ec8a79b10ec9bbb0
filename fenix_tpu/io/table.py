"""Named-table catalog over a root directory.

Role parity: /root/reference/src/fenix/io/table/table.py:12-56 — tables
live at ``<root>/sources/<name>.arrow``; multi-name loads concatenate;
``join`` concatenates along rows (axis=0) or zips columns (axis=1).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Literal, Sequence

import pyarrow as pa

from fenix_tpu.io import arrow

LOCATION: str = "sources"


def safe_join(root: str, location: str, *parts: str) -> str:
    """Join client-supplied path parts under ``root/location``,
    rejecting traversal. Names may contain ``/`` for namespacing (the
    reference uses names like ``test/table``) but must stay inside
    their artifact directory — a table name must not be able to
    address coder or index files, let alone anything outside the root."""
    for part in parts:
        segments = part.replace("\\", "/").split("/")
        if ".." in segments or part.startswith(("/", "\\")):
            raise ValueError(f"name escapes storage root: {parts!r}")
    base = os.path.abspath(os.path.join(root, location))
    path = os.path.abspath(os.path.join(base, *parts))
    if not path.startswith(base + os.sep):
        raise ValueError(f"name escapes storage root: {parts!r}")
    return path


def path_of(root: str, name: str) -> str:
    return safe_join(root, LOCATION, name + ".arrow")


def load(root: str, name: str | Sequence[str]) -> pa.Table:
    if isinstance(name, str):
        return arrow.load(path_of(root, name))

    assert isinstance(name, Sequence)
    return join(*[load(root, n) for n in name])


def make(root: str, name: str, data: pa.RecordBatchReader) -> pa.Table:
    return arrow.make(path_of(root, name), data)


def append(root: str, name: str, data: pa.Table) -> pa.Table:
    """Append rows to an existing table (create it if absent).

    Beyond the reference (its ``do_put`` only overwrites,
    /root/reference/src/fenix/flight.py:34-44): the combined table is
    rewritten through the same atomic publish as ``make``, so readers
    see either the old or the new revision, never a torn file. The
    read-modify-write itself serializes on the per-root catalog lock —
    concurrent appends would otherwise lose rows (last ``os.replace``
    wins).
    """
    from fenix_tpu.io.locks import catalog_lock

    with catalog_lock(root):
        path = path_of(root, name)
        if not os.path.exists(path):
            return arrow.make(path, data.to_reader())

        old = arrow.load(path)
        if old.schema != data.schema:
            raise ValueError(
                f"append schema mismatch for table {name!r}:\n"
                f"existing: {old.schema}\nappended: {data.schema}"
            )
        return arrow.make(path, pa.concat_tables([old, data]).to_reader())


def join(*data: pa.Table, axis: Literal[0, 1] = 0) -> pa.Table:
    if len(data) == 1:
        return data[0]

    match axis:
        case 0:
            return pa.concat_tables(data)
        case 1:
            return pa.table({c: t.column(c) for t in data for c in t.column_names})
        case _:
            raise ValueError(f"axis must be 0 or 1, got {axis}")


def list(root: str) -> Iterator[str]:
    base = os.path.join(root, LOCATION)
    for path in sorted(glob.glob(os.path.join(base, "**", "*.arrow"), recursive=True)):
        yield os.path.relpath(path, base).removesuffix(".arrow")


def drop(root: str, name: str) -> None:
    path = path_of(root, name)
    if os.path.exists(path):
        os.unlink(path)
