"""PII redaction (functions/redact.py): planted-PII behavior, engine/
oracle parity on adversarial text, ordering contract, and the
zero-exchange plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.functions import redact as RD

ROWS = [
    (0, "contact john.doe+x@example.co.uk or https://a.b/c?d=1 now"),
    (1, "server 192.168.001.255 port 001234567 id 12345 ok"),
    (2, "plain words only no pii here"),
    (3, ""),
    (4, "a@b.io a@b.io 9999999 http://x.y/z@q.com 10.0.0.1"),
    (5, "edge@case. trailing 123456seven 1.2.3.4.5.6"),
    (6, None),
    # url swallows the embedded email; ip inside url also swallowed
    (7, "see https://u:p@h.com/10.0.0.1/x and then mail u:p@h.com"),
    # URL must stop at ANY whitespace (newline/tab), not just space —
    # regression for the `[^ ]+` pattern that ate following lines
    (8, "link https://a.b/c\nnext line stays 1.2.3.4\tafter-tab"),
]


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    d.execute("CREATE TABLE t (id INT, text VARCHAR)")
    d.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    return d


def test_planted_pii_redaction(spark):
    df = spark.createDataFrame(ROWS, "id int, text string")
    got = {
        r["id"]: (r["red"], r["hits"])
        for r in df.select(
            "id",
            RD.redact_pii(F.col("text")).alias("red"),
            RD.pii_hits(F.col("text")).alias("hits"),
        ).collect()
    }
    assert got[0] == ("contact <EMAIL> or <URL> now", 2)
    assert got[1] == ("server <IP> port <NUM> id 12345 ok", 2)
    assert got[2] == ("plain words only no pii here", 0)
    assert got[3] == ("", 0)
    assert got[4] == ("<EMAIL> <EMAIL> <NUM> <URL> <IP>", 5)
    # digit run inside a word still matches; 6 dotted groups leave a tail
    assert got[5] == ("edge@case. trailing <NUM>seven <IP>.5.6", 2)
    assert got[6] == (None, None)
    # ordering contract: URL first, so the url-embedded email/IP are
    # gone; the bare `u:p@h.com` still yields an email match (`p@h.com`)
    assert got[7] == ("see <URL> and then mail u:<EMAIL>", 2)
    # redaction is line-local: text after \n and \t survives
    assert got[8] == ("link <URL>\nnext line stays <IP>\tafter-tab", 2)


def test_oracle_twin_parity(spark, duck):
    ora = duck.sql(
        f"SELECT id, {RD.redact_pii_sql('text')} AS red, "
        f"{RD.pii_hits_sql('text')} AS hits FROM t ORDER BY id"
    ).fetchall()
    df = spark.createDataFrame(ROWS, "id int, text string")
    eng = df.select(
        "id",
        RD.redact_pii(F.col("text")).alias("red"),
        RD.pii_hits(F.col("text")).alias("hits"),
    ).orderBy("id").collect()
    for o, e in zip(ora, eng):
        assert (o[1], o[2]) == (e["red"], e["hits"]), o[0]


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame(ROWS, "id int, text string")
    out = df.select(
        RD.redact_pii(F.col("text")).alias("red"),
        RD.pii_hits(F.col("text")).alias("hits"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # regexp_replace/count are codegen'd JVM expressions, never Python
    assert "Python" not in plan and "BatchEval" not in plan
