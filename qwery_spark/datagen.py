"""Deterministic synthetic change-event generator (seeded; no external data).

Produces the binlog/WAL-tail fixture described in FIXTURES.md §F2:
dense increasing ordinals, op mix ~70/20/9/1 (I/U/D/DDL), Zipfian
update/delete key distribution (hot-key skew on low key ids), token
arrays in [0, VOCAB_SIZE), and a seeded violation_rate of events whose
n_tok disagrees with len(tokens) (quarantine fixture).

Generation is fully vectorized (numpy + pyarrow); events are emitted as
a pyarrow Table and optionally chunked into one parquet file per
micro-batch for streaming / checkpoint kill-resume tests.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from qwery_spark.schema import VOCAB_SIZE

ARROW_EVENT_SCHEMA = pa.schema(
    [
        pa.field("ordinal", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("ddl", pa.string()),
    ]
)

SOURCES = np.array(["web", "books", "code", "wiki"])


def _doc_ids(key_ids: np.ndarray) -> np.ndarray:
    # doc-%012d
    return np.char.add("doc-", np.char.zfill(key_ids.astype("U12"), 12))


def make_events(
    n_events: int,
    seed: int = 42,
    max_len: int = 128,
    violation_rate: float = 0.001,
    p_insert: float = 0.70,
    p_update: float = 0.20,
    p_delete: float = 0.09,
    ddl_events: list[tuple[int, dict]] | None = None,
    zipf_a: float = 1.1,
    start_ordinal: int = 0,
) -> pa.Table:
    """Generate ``n_events`` deterministic change events as a pyarrow Table.

    ``ddl_events`` is a list of (relative_position, ddl_dict) pairs that are
    spliced in as op='DDL' rows at those positions (replacing the generated
    row there), keeping ordinals dense. The random op mix covers I/U/D only;
    DDL is scripted so the replay oracle can mirror it exactly.
    """
    rng = np.random.default_rng(seed)
    p_total = p_insert + p_update + p_delete
    ops = rng.choice(
        np.array(["I", "U", "D"]),
        size=n_events,
        p=[p_insert / p_total, p_update / p_total, p_delete / p_total],
    )

    # Key assignment: each I mints the next sequential key id; U/D target an
    # existing key with Zipfian rank (rank 0 = hottest) over keys inserted so
    # far. A U/D before any insert is flipped to I.
    is_insert = ops == "I"
    inserts_before = np.cumsum(is_insert) - is_insert  # count of I strictly before
    ops[(~is_insert) & (inserts_before == 0)] = "I"
    is_insert = ops == "I"
    inserts_before = np.cumsum(is_insert) - is_insert

    key_ids = np.zeros(n_events, dtype=np.int64)
    key_ids[is_insert] = np.arange(int(is_insert.sum()), dtype=np.int64)
    nonins = ~is_insert
    if nonins.any():
        # Zipf sample >= 1; rank r targets the r-th oldest key (old keys hot)
        ranks = rng.zipf(zipf_a, size=int(nonins.sum())) - 1
        key_ids[nonins] = ranks % inserts_before[nonins]

    # token payloads for I/U (null for D/DDL)
    has_payload = ops != "D"
    n_payload = int(has_payload.sum())
    lengths = rng.integers(1, max_len + 1, size=n_payload, dtype=np.int32)
    flat = rng.integers(0, VOCAB_SIZE, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.zeros(n_payload + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    # assemble per-event list offsets (D rows are null lists)
    n_tok = np.zeros(n_events, dtype=np.int32)
    n_tok[has_payload] = lengths
    # violations: seeded subset of payload rows get n_tok off by one
    n_viol = int(round(n_events * violation_rate))
    if n_viol:
        viol_idx = rng.choice(np.flatnonzero(has_payload), size=n_viol, replace=False)
        n_tok[viol_idx] = n_tok[viol_idx] + 1

    sources = SOURCES[rng.integers(0, len(SOURCES), size=n_events)]

    tokens_values = pa.array(flat, type=pa.int32())
    # build full-table offsets: null for non-payload rows
    full_offsets = np.zeros(n_events + 1, dtype=np.int32)
    payload_pos = np.cumsum(has_payload)  # 1-based index into lengths
    full_offsets[1:] = offsets[payload_pos]
    validity = pa.array(has_payload)
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(full_offsets, type=pa.int32()), tokens_values, mask=pa.compute.invert(validity)
    )

    ordinals = np.arange(start_ordinal, start_ordinal + n_events, dtype=np.int64)
    doc_ids = _doc_ids(key_ids)

    cols: dict[str, pa.Array] = {
        "ordinal": pa.array(ordinals, type=pa.int64()),
        "op": pa.array(ops),
        "doc_id": pa.array(doc_ids),
        "tokens": tokens_arr,
        "n_tok": pa.array(np.where(has_payload, n_tok, 0), type=pa.int32()),
        "source": pa.array(sources),
        "ddl": pa.nulls(n_events, pa.string()),
    }
    tbl = pa.Table.from_arrays(
        [cols[f.name] for f in ARROW_EVENT_SCHEMA], schema=ARROW_EVENT_SCHEMA
    )
    # null out n_tok/source/tokens for D rows is already handled for tokens;
    # n_tok for D rows: set null via mask
    d_mask = pa.array(ops == "D")
    n_tok_col = pa.compute.if_else(d_mask, pa.nulls(n_events, pa.int32()), tbl["n_tok"].combine_chunks())
    tbl = tbl.set_column(4, ARROW_EVENT_SCHEMA.field("n_tok"), n_tok_col)

    if ddl_events:
        tbl = _splice_ddl(tbl, ddl_events)
    return tbl


def _splice_ddl(tbl: pa.Table, ddl_events: list[tuple[int, dict]]) -> pa.Table:
    """Replace rows at given positions with op='DDL' rows (ordinals dense)."""
    n = tbl.num_rows
    op = tbl["op"].to_numpy(zero_copy_only=False).astype(object)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(object)
    ddl = np.array([None] * n, dtype=object)
    positions = set()
    for pos, spec in ddl_events:
        if 0 <= pos < n:
            op[pos] = "DDL"
            doc[pos] = None
            ddl[pos] = json.dumps(spec, sort_keys=True)
            positions.add(pos)
    # null tokens/n_tok/source at DDL positions
    mask = np.zeros(n, dtype=bool)
    mask[list(positions)] = True
    pmask = pa.array(mask)
    tokens = pa.compute.if_else(pmask, pa.nulls(n, tbl["tokens"].type), tbl["tokens"].combine_chunks())
    n_tok = pa.compute.if_else(pmask, pa.nulls(n, pa.int32()), tbl["n_tok"].combine_chunks())
    source = pa.compute.if_else(pmask, pa.nulls(n, pa.string()), tbl["source"].combine_chunks())
    out = pa.Table.from_arrays(
        [
            tbl["ordinal"].combine_chunks(),
            pa.array(op, type=pa.string()),
            pa.array(doc, type=pa.string()),
            tokens,
            n_tok,
            source,
            pa.array(ddl, type=pa.string()),
        ],
        schema=ARROW_EVENT_SCHEMA,
    )
    return out


def write_event_chunks(
    tbl: pa.Table, out_dir: str, n_chunks: int, row_group_size: int = 32_000
) -> list[str]:
    """Write the event table as n_chunks parquet files (one per micro-batch).

    Files are named chunk-00000.parquet ... so lexical order == ordinal
    order, which lets Spark's file streaming source deliver them in order
    (maxFilesPerTrigger=1 -> one micro-batch per chunk).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    paths = []
    bounds = np.linspace(0, n, n_chunks + 1, dtype=np.int64)
    for i in range(n_chunks):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"chunk-{i:05d}.parquet")
        # small row groups keep the Spark scan splittable: a micro-batch
        # file must never serialize into a single scan task
        pq.write_table(tbl.slice(lo, hi - lo), path, row_group_size=row_group_size)
        paths.append(path)
    return paths
