"""Single-threaded replay oracle (test-only).

Mirrors the reference's row-at-a-time UPSERT KEYED ON semantics
(app/jvm/core/.../ops/sql/Upsert.scala:14-33: events applied strictly
in stream order, last writer wins per key; per-row failures skipped
without aborting, JDBCOutputSource.scala:92-99). The engine's
distributed output must equal this oracle's final state EXACTLY,
including per-row token arrays (BASELINE.json input_hint).

Deliberately implemented with plain Python/numpy over pandas rows —
slow, obvious, and independent of every Spark code path under test.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from qwery_spark.schema import VOCAB_SIZE


def _valid(op, doc_id, tokens, n_tok, vocab) -> str | None:
    if op != "DDL" and (doc_id is None or (isinstance(doc_id, float) and pd.isna(doc_id))):
        return "null_doc_id"
    if op in ("I", "U"):
        if tokens is None or (isinstance(tokens, float) and pd.isna(tokens)):
            return "null_tokens"
        toks = np.asarray(tokens)
        if n_tok is None or pd.isna(n_tok) or len(toks) != int(n_tok):
            return "n_tok_mismatch"
        if len(toks) and (toks.min() < 0 or toks.max() >= vocab):
            return "token_out_of_range"
    return None


def replay_oracle(events: pd.DataFrame, vocab: int = VOCAB_SIZE):
    """Replay events in ordinal order; return (final_state_df, counters).

    final_state columns: doc_id, tokens, n_tok, source, last_ordinal
    plus any columns introduced by add_column DDL (null-filled), with
    rename/widen applied. Rows sorted by doc_id.
    """
    state: dict[str, dict] = {}
    extra_cols: list[tuple[str, str]] = []  # (name, type)
    renames: dict[str, str] = {}
    dropped_cols: set[str] = set()
    counters = {"applied": 0, "rejected": 0, "deleted": 0, "ddl": 0}

    ev = events.sort_values("ordinal")
    for row in ev.itertuples(index=False):
        op = row.op
        if op == "DDL":
            spec = json.loads(row.ddl)
            if spec["action"] == "add_column":
                # base columns re-added after a drop are emitted by the
                # base path below — adding them to extra_cols would
                # shadow their repopulated values with None
                if spec["name"] not in ("tokens", "n_tok", "source") and spec[
                    "name"
                ] not in [c for c, _ in extra_cols]:
                    extra_cols.append((spec["name"], spec["type"]))
                # re-adding a previously dropped name reincarnates the
                # column (fresh field id on the engine side): it is no
                # longer dropped, and values written BEFORE the drop
                # stay invisible (None-ed at drop time below)
                dropped_cols.discard(spec["name"])
            elif spec["action"] == "rename_column":
                renames[spec["from"]] = spec["to"]
            elif spec["action"] == "drop_column":
                name = spec["name"]
                extra_cols = [(c, t) for c, t in extra_cols if c != name]
                dropped_cols.add(name)
                # old values must not resurface if the name is re-added
                for s in state.values():
                    if name in s:
                        s[name] = None
            # widen_type: no value change at oracle level
            counters["ddl"] += 1
            continue
        reason = _valid(op, row.doc_id, row.tokens, row.n_tok, vocab)
        if reason is not None:
            counters["rejected"] += 1
            continue
        if op == "D":
            state.pop(row.doc_id, None)
            counters["deleted"] += 1
        else:
            state[row.doc_id] = {
                "tokens": np.asarray(row.tokens, dtype=np.int32),
                "n_tok": int(row.n_tok),
                "source": row.source,
                "last_ordinal": int(row.ordinal),
            }
            counters["applied"] += 1

    recs = []
    for doc_id in sorted(state):
        s = state[doc_id]
        rec = {
            "doc_id": doc_id,
            "tokens": s["tokens"],
            "n_tok": s["n_tok"],
            "source": s["source"],
            "last_ordinal": s["last_ordinal"],
        }
        for name, _t in extra_cols:
            rec[name] = None
        recs.append(rec)
    cols = ["doc_id", "tokens", "n_tok", "source"] + [c for c, _ in extra_cols] + ["last_ordinal"]
    out = pd.DataFrame(recs, columns=cols)
    for old, new in renames.items():
        if old in out.columns:
            out = out.rename(columns={old: new})
    out = out.drop(columns=[c for c in dropped_cols if c in out.columns])
    return out, counters
