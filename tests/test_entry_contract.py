"""Driver-contract invariants for __ray_entry__.py: every oracle key must
name a registered query, every registry value must be callable, and the
registries must build without starting Ray."""

import sys

sys.path.insert(0, "/root/repo")


def test_oracle_keys_subset_of_queries(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
    # the round-2 surface: keep these counts monotone across rounds
    assert len(q) >= 97, len(q)
    assert len(o) >= 54, len(o)
