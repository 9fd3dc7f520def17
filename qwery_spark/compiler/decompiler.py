"""Statement decompiler: parse the engine's lake-statement surface into
a small AST and render it back as canonical text.

Reference parity: qwery ships a decompiler whose AST → SQL output is
round-trip tested (core:QweryDecompiler.scala:15-23 — every parsed op
renders back to equivalent SQL). Our compiler hands the SELECT core to
Catalyst, so the interesting surface to round-trip is the statement
layer the engine itself owns: the lake DDL/DML/maintenance verbs.
Everything else (SELECT/INSERT/native SQL) passes through verbatim —
Catalyst is its decompiler.

Contract (pinned by tests/test_decompiler.py):
  * ``parse_statement(render(parse_statement(s))) == parse_statement(s)``
    (render is a fixpoint of the grammar), and
  * ``ScriptEngine.execute`` accepts the rendered text for every verb
    (the canonical form stays inside the executable grammar — the
    behavioral coupling that keeps this module honest against the
    engine's inline regexes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from qwery_spark.compiler import grammar as G


@dataclass
class Stmt:
    kind: str
    props: dict = field(default_factory=dict)


def _ws(s: str) -> str:
    """Collapse runs of whitespace — ONLY for clause fragments that can
    never carry string literals (column lists, type names). Fragments
    that can (SET assignments, WHERE predicates, SELECT bodies) pass
    through stripped-but-verbatim: normalizing them would rewrite the
    literal content."""
    return re.sub(r"\s+", " ", s.strip())


def parse_statement(stmt: str) -> Stmt:
    """Parse one statement into its AST node; statements outside the
    lake verb family become kind='sql' passthrough nodes."""
    s = stmt.strip().rstrip(";").strip()
    up = s.upper()

    m = G.CREATE_LAKE.match(s)
    if m:
        return Stmt("create_lake", {
            "if_not_exists": bool(m.group(1)),
            "path": m.group(2),
            "columns": _ws(m.group(3)),
            "key": m.group(4),
            "buckets": int(m.group(5)) if m.group(5) else None,
            "mode": (m.group(6) or "").lower() or None,
            "codec": (m.group(7) or "").lower() or None,
            "stats": [c.strip() for c in (m.group(8) or "").split(",") if c.strip()] or None,
        })

    m = G.DROP_LAKE.match(s)
    if m:
        return Stmt("drop_lake", {"if_exists": bool(m.group(1)), "path": m.group(2)})

    m = re.match(
        r"ALTER\s+LAKE\s+'([^']+)'\s+(.+)$", s, re.IGNORECASE | re.DOTALL
    )
    if m and re.match(r"ALTER\s+LAKE\b", up):
        path, verb = m.group(1), _ws(m.group(2))
        vu = verb.upper()
        for pat, kind, keys in (
            (r"ADD\s+COLUMN\s+(\w+)\s+(.+)$", "add", ("name", "type")),
            (r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$", "rename", ("old", "new")),
            (r"WIDEN\s+COLUMN\s+(\w+)\s+TO\s+(.+)$", "widen", ("name", "type")),
            (r"DROP\s+COLUMN\s+(\w+)$", "drop", ("name",)),
            (r"REBUCKET\s+(\d+)$", "rebucket", ("n",)),
        ):
            vm = re.match(pat, verb, re.IGNORECASE)
            if vm:
                props = {"path": path, "verb": kind}
                for k, v in zip(keys, vm.groups()):
                    props[k] = _ws(v) if k == "type" else v
                return Stmt("alter_lake", props)

    m = G.UPSERT.match(s)
    if m:
        return Stmt("upsert", {
            "matched_only": m.group(1).upper().startswith("UPDATE"),
            "path": m.group(2),
            "key": m.group(3),
            "ordinal": m.group(4),
            "select": m.group(5).strip(),
        })

    m = G.UPDATE_SET.match(s)
    if m:
        return Stmt("update_set", {
            "path": m.group(1),
            "assignments": m.group(2).strip(),
            "key": m.group(3),
            "ordinal": int(m.group(4)) if m.group(4) else None,
            "where": m.group(5).strip() if m.group(5) else None,
        })

    m = G.DELETE.match(s)
    if m:
        return Stmt("delete", {
            "path": m.group(1), "key": m.group(2), "ordinal": int(m.group(3)),
            "where": m.group(4).strip() if m.group(4) else None,
        })

    m = G.COMPACT.match(s)
    if m:
        return Stmt("compact", {
            "path": m.group(1),
            "cluster": (m.group(2) or "").upper() or None,
            "cols": [c.strip() for c in m.group(3).split(",")] if m.group(3) else None,
            "drop_tombstones": bool(m.group(4)),
        })

    m = G.BINPACK.match(s)
    if m:
        return Stmt("binpack", {
            "path": m.group(1),
            "small": int(m.group(2)) if m.group(2) else None,
            "min_files": int(m.group(3)) if m.group(3) else None,
        })

    m = G.VACUUM.match(s)
    if m:
        return Stmt("vacuum", {
            "path": m.group(1),
            "grace": int(m.group(2)) if m.group(2) is not None else None,
        })

    m = G.EXPIRE.match(s)
    if m:
        return Stmt("expire", {
            "path": m.group(1),
            "keep": int(m.group(2)) if m.group(2) else None,
            "older_than": int(m.group(3)) if m.group(3) else None,
        })

    m = G.SHOW_SNAPSHOTS.match(s)
    if m:
        return Stmt("show_snapshots", {"path": m.group(1)})

    m = G.SHOW_CHANGES.match(s)
    if m:
        return Stmt("show_changes", {
            "path": m.group(1),
            "from": int(m.group(2)) if m.group(2) else None,
            "to": int(m.group(3)) if m.group(3) else None,
            "coarse": bool(m.group(4)),
            "window": int(m.group(5)) if m.group(5) else None,
        })

    m = G.SHOW_LINEAGE.match(s)
    if m:
        return Stmt("show_lineage", {
            "path": m.group(1),
            "expecting": int(m.group(2)) if m.group(2) else None,
        })

    m = G.REPLICATE.match(s)
    if m:
        return Stmt("replicate_lake", {
            "src": m.group(1), "dst": m.group(2),
            "from": int(m.group(3)) if m.group(3) else None,
            "to": int(m.group(4)) if m.group(4) else None,
            "epoch": m.group(5),
        })

    m = G.DESCRIBE_LAKE.match(s)
    if m:
        return Stmt("describe_lake", {"path": m.group(1)})

    m = G.CREATE_BRANCH.match(s)
    if m:
        return Stmt("create_branch", {
            "name": m.group(1), "path": m.group(2),
            "at_version": int(m.group(3)) if m.group(3) else None,
        })

    m = G.PUBLISH_BRANCH.match(s)
    if m:
        return Stmt("publish_branch", {"name": m.group(1), "path": m.group(2)})

    m = G.DROP_BRANCH.match(s)
    if m:
        return Stmt("drop_branch", {
            "name": m.group(1), "path": m.group(2),
            "keep_files": bool(m.group(3)),
        })

    m = G.SHOW_BRANCHES.match(s)
    if m:
        return Stmt("show_branches", {"path": m.group(1)})

    m = G.ROLLBACK_LAKE.match(s)
    if m:
        return Stmt("rollback_lake", {
            "path": m.group(1), "to_version": int(m.group(2)),
        })

    return Stmt("sql", {"text": s})


def render(st: Stmt) -> str:
    """Canonical text for an AST node — always re-parseable to an equal
    node, always executable by ScriptEngine."""
    p = st.props
    if st.kind == "create_lake":
        out = "CREATE LAKE "
        if p["if_not_exists"]:
            out += "IF NOT EXISTS "
        out += f"'{p['path']}' ({p['columns']}) KEYED ON {p['key']}"
        if p["buckets"] is not None:
            out += f" BUCKETS {p['buckets']}"
        if p["mode"]:
            out += f" MODE {p['mode']}"
        if p["codec"]:
            out += f" CODEC {p['codec']}"
        if p["stats"]:
            out += f" STATS ({', '.join(p['stats'])})"
        return out
    if st.kind == "drop_lake":
        ie = "IF EXISTS " if p["if_exists"] else ""
        return f"DROP LAKE {ie}'{p['path']}'"
    if st.kind == "alter_lake":
        v = p["verb"]
        body = {
            "add": lambda: f"ADD COLUMN {p['name']} {p['type']}",
            "rename": lambda: f"RENAME COLUMN {p['old']} TO {p['new']}",
            "widen": lambda: f"WIDEN COLUMN {p['name']} TO {p['type']}",
            "drop": lambda: f"DROP COLUMN {p['name']}",
            "rebucket": lambda: f"REBUCKET {p['n']}",
        }[v]()
        return f"ALTER LAKE '{p['path']}' {body}"
    if st.kind == "upsert":
        head = "UPDATE" if p["matched_only"] else "UPSERT INTO"
        out = f"{head} LAKE '{p['path']}' KEYED ON {p['key']}"
        if p["ordinal"]:
            out += f" ORDINAL {p['ordinal']}"
        return f"{out} {p['select']}"
    if st.kind == "update_set":
        out = f"UPDATE LAKE '{p['path']}' SET {p['assignments']} KEYED ON {p['key']}"
        if p["ordinal"] is not None:
            out += f" ORDINAL {p['ordinal']}"
        if p["where"]:
            out += f" WHERE {p['where']}"
        return out
    if st.kind == "delete":
        out = (
            f"DELETE FROM LAKE '{p['path']}' KEYED ON {p['key']} "
            f"ORDINAL {p['ordinal']}"
        )
        if p["where"]:
            out += f" WHERE {p['where']}"
        return out
    if st.kind == "compact":
        out = f"COMPACT LAKE '{p['path']}'"
        if p["cluster"]:
            out += f" {p['cluster']} BY ({', '.join(p['cols'])})"
        if p["drop_tombstones"]:
            out += " DROP TOMBSTONES"
        return out
    if st.kind == "binpack":
        out = f"BINPACK LAKE '{p['path']}'"
        if p["small"] is not None:
            out += f" SMALL {p['small']}"
        if p["min_files"] is not None:
            out += f" MIN FILES {p['min_files']}"
        return out
    if st.kind == "vacuum":
        out = f"VACUUM LAKE '{p['path']}'"
        if p["grace"] is not None:
            out += f" GRACE {p['grace']}"
        return out
    if st.kind == "expire":
        out = f"EXPIRE SNAPSHOTS '{p['path']}'"
        if p["keep"] is not None:
            out += f" KEEP {p['keep']}"
        if p.get("older_than") is not None:
            out += f" OLDER THAN {p['older_than']}"
        return out
    if st.kind == "show_snapshots":
        return f"SHOW SNAPSHOTS '{p['path']}'"
    if st.kind == "show_changes":
        out = f"SHOW CHANGES '{p['path']}'"
        if p["from"] is not None:
            out += f" FROM {p['from']}"
        if p["to"] is not None:
            out += f" TO {p['to']}"
        if p.get("coarse"):
            out += " COARSE"
        elif p.get("window") is not None:
            out += f" WINDOW {p['window']}"
        return out
    if st.kind == "show_lineage":
        out = f"SHOW LINEAGE '{p['path']}'"
        if p["expecting"] is not None:
            out += f" EXPECTING {p['expecting']}"
        return out
    if st.kind == "replicate_lake":
        out = f"REPLICATE LAKE '{p['src']}' INTO '{p['dst']}'"
        if p["from"] is not None:
            out += f" FROM {p['from']}"
        if p["to"] is not None:
            out += f" TO {p['to']}"
        if p["epoch"]:
            out += f" EPOCH '{p['epoch']}'"
        return out
    if st.kind == "describe_lake":
        return f"DESCRIBE LAKE '{p['path']}'"
    if st.kind == "create_branch":
        out = f"CREATE BRANCH '{p['name']}' ON LAKE '{p['path']}'"
        if p["at_version"] is not None:
            out += f" AT VERSION {p['at_version']}"
        return out
    if st.kind == "publish_branch":
        return f"PUBLISH BRANCH '{p['name']}' ON LAKE '{p['path']}'"
    if st.kind == "drop_branch":
        out = f"DROP BRANCH '{p['name']}' ON LAKE '{p['path']}'"
        if p["keep_files"]:
            out += " KEEP FILES"
        return out
    if st.kind == "show_branches":
        return f"SHOW BRANCHES '{p['path']}'"
    if st.kind == "rollback_lake":
        return f"ROLLBACK LAKE '{p['path']}' TO VERSION {p['to_version']}"
    if st.kind == "sql":
        return p["text"]
    raise ValueError(f"unknown statement kind: {st.kind}")


def decompile(stmt: str) -> str:
    """Canonical form of a statement (parse → render)."""
    return render(parse_statement(stmt))
