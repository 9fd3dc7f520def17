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
