"""Feature-service-style side-input loader (SURVEY.md §2.3).

The reference's ``ZonalAttributesTable`` (functions/utils.py:149-258) reads
a zone-id-keyed attribute table from a local table or a remote feature
service with three pushdowns: a WHERE clause, an ``idField IN (idList)``
key-set restriction, and an envelope-INTERSECTS spatial predicate on the
request extent.  This sandbox has no network, so the engine serves the
same interface over a local parquet "service" via DuckDB — the pushdowns
run inside the scan (DuckDB predicate pushdown over parquet row groups),
not as post-filters, which is the property that matters at scale: an
actor refreshing its zone cache for one tile's extent must not page the
whole zone table.

Result shape matches the reference exactly: ``{zone_id: [tuple(attrs),
...]}`` with ``None`` placeholders for unselected attributes
(functions/utils.py:159-171 field-index bookkeeping, :253-258
_addAttributes accumulation).
"""

from __future__ import annotations

import os


class ZonalAttributesService:
    """Local-parquet stand-in for the reference's table/feature-service
    connection, same constructor and ``query`` signature."""

    def __init__(self, table_uri: str, id_field: str | None = None,
                 attrib_list: list[str] | None = None,
                 bbox_field: str = "bbox"):
        if table_uri is None or not os.path.exists(table_uri):
            raise ValueError(f"no such table: {table_uri!r}")
        self.table_uri = table_uri
        self.id_field = id_field
        self.bbox_field = bbox_field
        self.attrib_list = attrib_list or []
        # reference's field-index bookkeeping: empty/None attribute slots
        # stay in the output tuple as None (functions/utils.py:159-171)
        k = 0
        self.fi, self.query_fields = [], []
        for a in self.attrib_list:
            if a:
                self.query_fields.append(a)
                self.fi.append(k)
                k += 1
            else:
                self.fi.append(None)
        if self.id_field:
            self.fi = [i + 1 if i is not None else None for i in self.fi]
            self.query_fields = [self.id_field] + self.query_fields
        if not self.query_fields:
            raise ValueError("no fields to query")
        self.tuple_size = len(self.fi)

    def _where(self, id_list, where) -> str:
        """The reference's _constructWhereClause (functions/utils.py:246-255)."""
        w1 = f"( {where} )" if where else None
        w2 = None
        if self.id_field and id_list is not None and len(id_list):
            w2 = "( {0} IN ({1}) )".format(
                self.id_field, ",".join(str(int(z)) for z in id_list))
        return "{0}{1}{2}".format(w1 or "", " AND " if w1 and w2 else "", w2 or "")

    def query(self, id_list=(), where: str | None = None,
              extent=None, sr=None) -> dict:
        """WHERE + idList + envelope-intersects pushdown query; returns
        ``{zone_id: [attr_tuple, ...]}`` (zone_id None when no id field)."""
        import duckdb

        clauses = []
        w = self._where(id_list, where)
        if w:
            clauses.append(w)
        if extent is not None and len(extent) == 4:
            # esriSpatialRelEnvelopeIntersects on the closed bbox
            clauses.append(
                f"({self.bbox_field}[1] <= {float(extent[2])!r}"
                f" AND {self.bbox_field}[3] >= {float(extent[0])!r}"
                f" AND {self.bbox_field}[2] <= {float(extent[3])!r}"
                f" AND {self.bbox_field}[4] >= {float(extent[1])!r})")
        sql = "SELECT {0} FROM read_parquet('{1}')".format(
            ", ".join(self.query_fields), self.table_uri)
        if clauses:
            sql += " WHERE " + " AND ".join(clauses)
        rows = duckdb.connect().execute(sql).fetchall()
        out: dict = {}
        id_pos = 0 if self.id_field else None
        for row in rows:
            attrs = tuple(row[self.fi[k]] if self.fi[k] is not None else None
                          for k in range(self.tuple_size))
            zid = row[id_pos] if id_pos is not None else None
            out.setdefault(zid, []).append(attrs)
        return out
