import numpy as np
import pandas as pd

from qwery_spark.cdc.oracle import replay_oracle


def table_state(spark, table) -> pd.DataFrame:
    pdf = table.read(spark).toPandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def assert_state_equals_oracle(spark, table, events_pdf: pd.DataFrame):
    expected, counters = replay_oracle(events_pdf)
    actual = table_state(spark, table)
    assert list(actual["doc_id"]) == list(expected["doc_id"]), (
        f"key sets differ: engine={len(actual)} oracle={len(expected)}"
    )
    # per-row token-array equality (the BASELINE input_hint invariant)
    for i, (a, e) in enumerate(zip(actual["tokens"], expected["tokens"])):
        a_arr = None if a is None else np.asarray(a, dtype=np.int64)
        e_arr = None if e is None else np.asarray(e, dtype=np.int64)
        if a_arr is None or e_arr is None:
            assert a_arr is None and e_arr is None, f"row {i} token null mismatch"
        else:
            assert np.array_equal(a_arr, e_arr), f"row {i} ({actual['doc_id'][i]}) tokens differ"
    for col in expected.columns:
        if col in ("tokens", "last_ordinal"):
            continue
        if col not in actual.columns:
            raise AssertionError(f"engine missing column {col}")
        av = actual[col].to_numpy(dtype=object)
        ev = expected[col].to_numpy(dtype=object)
        mism = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, ev))
            if not (
                (x is None or (isinstance(x, float) and pd.isna(x)))
                and (y is None or (isinstance(y, float) and pd.isna(y)))
            )
            and x != y
        ]
        assert not mism, f"column {col} mismatches: {mism[:5]}"
    return counters
