"""HTTP source (reference: TextFileInputDevice reads http:// URLs) —
served from a local in-test HTTP server, plus TOP n syntax."""

import http.server
import os
import threading

import pytest

from qwery_spark.compiler import ScriptEngine
from qwery_spark.sources import read_source


@pytest.fixture(scope="module")
def http_csv(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("httpsrv"))
    with open(os.path.join(d, "data.csv"), "w") as f:
        f.write("sym,price\nAAPL,190.5\nMSFT,410.2\n")

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(*a, directory=d, **k)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/data.csv"
    srv.shutdown()


def test_http_source(spark, http_csv):
    df = read_source(spark, http_csv, {})
    rows = {r["sym"]: r["price"] for r in df.collect()}
    assert rows == {"AAPL": "190.5", "MSFT": "410.2"}


def test_http_source_via_statement(spark, http_csv):
    eng = ScriptEngine(spark)
    out = eng.execute(f"SELECT TOP 1 sym FROM '{http_csv}' ORDER BY sym").collect()
    assert [r["sym"] for r in out] == ["AAPL"]


@pytest.fixture(scope="module")
def http_dir(tmp_path_factory):
    """Loopback server with JSON and gzip-CSV fixtures beside the CSV."""
    import gzip
    import json as _json

    d = str(tmp_path_factory.mktemp("httpsrv2"))
    with open(os.path.join(d, "rows.jsonl"), "w") as f:
        f.write(_json.dumps({"sym": "AAPL", "qty": 3}) + "\n")
        f.write(_json.dumps({"sym": "MSFT", "qty": 5}) + "\n")
    with gzip.open(os.path.join(d, "data.csv.gz"), "wt") as f:
        f.write("sym,price\nGOOG,170.1\nAMZN,185.4\n")

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(*a, directory=d, **k)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_json_source(spark, http_dir):
    df = read_source(spark, http_dir + "/rows.jsonl", {})
    rows = {r["sym"]: r["qty"] for r in df.collect()}
    assert rows == {"AAPL": 3, "MSFT": 5}


def test_http_gzip_csv_source(spark, http_dir):
    """The temp download must keep the full '.csv.gz' extension chain —
    format inference strips one .gz then routes on .csv, and Spark
    decompresses transparently."""
    df = read_source(spark, http_dir + "/data.csv.gz", {})
    rows = {r["sym"]: r["price"] for r in df.collect()}
    assert rows == {"GOOG": "170.1", "AMZN": "185.4"}
