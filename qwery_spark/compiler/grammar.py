"""The lake-verb grammar, shared by the engine (parse-and-execute) and
the decompiler (parse-and-render): ONE regex per verb, so the two can
never drift — a clause added here is immediately visible to both.

Patterns use re.IGNORECASE; multi-line bodies (SELECT payloads, WHERE
fragments) additionally need re.DOTALL where noted by the \\b(.*)$
tails.
"""

from __future__ import annotations

import re

CREATE_LAKE = re.compile(
    r"CREATE\s+LAKE\s+(IF\s+NOT\s+EXISTS\s+)?'([^']+)'\s*\((.*)\)"
    r"\s+KEYED\s+ON\s+(\w+)"
    r"(?:\s+BUCKETS\s+(\d+))?(?:\s+MODE\s+(mor|cow))?"
    r"(?:\s+CODEC\s+(\w+))?"
    r"(?:\s+STATS\s*\(([\w,\s]+)\))?"
    r"(?:\s+BLOOM\s*\(([\w,\s]+)\))?(?:\s+BLOOM\s+NDV\s+(\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

DROP_LAKE = re.compile(
    r"DROP\s+LAKE\s+(IF\s+EXISTS\s+)?'([^']+)'\s*$", re.IGNORECASE
)

# UPSERT INTO (insert-or-update) and bare UPDATE (matched-only) share
# one body shape
UPSERT = re.compile(
    r"(UPSERT\s+INTO|UPDATE)\s+LAKE\s+'([^']+)'\s+KEYED\s+ON\s+(\w+)"
    r"(?:\s+ORDINAL\s+(\w+))?\s+((?:SELECT|WITH)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

UPDATE_SET = re.compile(
    r"UPDATE\s+LAKE\s+'([^']+)'\s+SET\s+(.+?)\s+KEYED\s+ON\s+(\w+)"
    r"(?:\s+ORDINAL\s+(\d+))?(?:\s+WHERE\s+(.+))?$",
    re.IGNORECASE | re.DOTALL,
)

DELETE = re.compile(
    r"DELETE\s+FROM\s+LAKE\s+'([^']+)'\s+KEYED\s+ON\s+(\w+)"
    r"\s+ORDINAL\s+(\d+)(?:\s+WHERE\s+(.+))?$",
    re.IGNORECASE | re.DOTALL,
)

COMPACT = re.compile(
    r"COMPACT\s+LAKE\s+'([^']+)'"
    r"(?:\s+(SORT|ZORDER)\s+BY\s+\(([^()]+)\))?"
    r"(\s+DROP\s+TOMBSTONES)?\s*$",
    re.IGNORECASE,
)

VACUUM = re.compile(
    r"VACUUM\s+LAKE\s+'([^']+)'(?:\s+GRACE\s+(\d+))?\s*$", re.IGNORECASE
)

EXPIRE = re.compile(
    r"EXPIRE\s+SNAPSHOTS\s+'([^']+)'(?:\s+KEEP\s+(\d+))?"
    r"(?:\s+OLDER\s+THAN\s+(\d+))?\s*$",
    re.IGNORECASE,
)

SHOW_SNAPSHOTS = re.compile(r"SHOW\s+SNAPSHOTS\s+'([^']+)'\s*$", re.IGNORECASE)

SHOW_CHANGES = re.compile(
    r"SHOW\s+CHANGES\s+'([^']+)'(?:\s+FROM\s+(\d+))?(?:\s+TO\s+(\d+))?"
    r"(?:\s+(COARSE)|\s+WINDOW\s+(\d+))?\s*$",
    re.IGNORECASE,
)

SHOW_LINEAGE = re.compile(
    r"SHOW\s+LINEAGE\s+'([^']+)'(?:\s+EXPECTING\s+(\d+))?\s*$",
    re.IGNORECASE,
)

REPLICATE = re.compile(
    r"REPLICATE\s+LAKE\s+'([^']+)'\s+INTO\s+'([^']+)'"
    r"(?:\s+FROM\s+(\d+))?(?:\s+TO\s+(\d+))?(?:\s+EPOCH\s+'([^']+)')?\s*$",
    re.IGNORECASE,
)

DESCRIBE_LAKE = re.compile(r"DESCRIBE\s+LAKE\s+'([^']+)'\s*$", re.IGNORECASE)

# branches (Iceberg refs / write-audit-publish); branch WRITES/READS use
# the 'path@branch' operand form on the existing verbs
CREATE_BRANCH = re.compile(
    r"CREATE\s+BRANCH\s+'([^']+)'\s+ON\s+LAKE\s+'([^']+)'"
    r"(?:\s+AT\s+VERSION\s+(\d+))?\s*$",
    re.IGNORECASE,
)

PUBLISH_BRANCH = re.compile(
    r"PUBLISH\s+BRANCH\s+'([^']+)'\s+ON\s+LAKE\s+'([^']+)'\s*$", re.IGNORECASE
)

DROP_BRANCH = re.compile(
    r"DROP\s+BRANCH\s+'([^']+)'\s+ON\s+LAKE\s+'([^']+)'(\s+KEEP\s+FILES)?\s*$",
    re.IGNORECASE,
)

SHOW_BRANCHES = re.compile(r"SHOW\s+BRANCHES\s+'([^']+)'\s*$", re.IGNORECASE)

ROLLBACK_LAKE = re.compile(
    r"ROLLBACK\s+LAKE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*$", re.IGNORECASE
)

BINPACK = re.compile(
    r"BINPACK\s+LAKE\s+'([^']+)'(?:\s+SMALL\s+(\d+))?"
    r"(?:\s+MIN\s+FILES\s+(\d+))?\s*$",
    re.IGNORECASE,
)
