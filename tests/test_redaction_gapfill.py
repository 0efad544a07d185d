"""PII redaction + calendar gap-fill + full-outer reconcile: oracle parity
and semantic invariants."""

from __future__ import annotations

import re

import pytest

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import events_analytics as ea
from data_catalog_spark.operators import redaction as rd

from conftest import assert_same

PARITY = [
    (rd.docs_pii_redact, rd.PII_REDACT_ORACLE),
    (ea.events_gapfill_daily, ea.GAPFILL_ORACLE),
    (ea.events_daily_reconcile, ea.RECONCILE_ORACLE),
]


@pytest.mark.parametrize("fn,oracle", PARITY, ids=[f.__name__ for f, _ in PARITY])
def test_parity(spark, sf_dir, ddb, fn, oracle):
    assert_same(fn(spark, sf_dir), ddb, oracle)


def test_redaction_scrubs_everything(spark, sf_dir):
    """Every document gets laced with exactly one email, one phone, one IP —
    and the redacted text retains none of them (checked with an independent
    Python re pass, not the engine's own regex)."""
    rows = rd.docs_pii_redact(spark, sf_dir).collect()
    assert rows
    email = re.compile(rd.EMAIL_RE)
    phone = re.compile(rd.PHONE_RE)
    for r in rows:
        assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
        assert "<IP>" in r.redacted
        assert not email.search(r.redacted)
        assert not phone.search(r.redacted)


def test_gapfill_calendar_is_dense(spark, sf_dir):
    """One row per day over [min, max] with no holes, and the densified
    totals equal the raw totals (gap days add only zeros)."""
    rows = ea.events_gapfill_daily(spark, sf_dir).collect()
    days = [r.day for r in rows]
    assert days == sorted(days) and len(set(days)) == len(days)
    import datetime as dt

    d0 = dt.date.fromisoformat(days[0])
    d1 = dt.date.fromisoformat(days[-1])
    assert len(days) == (d1 - d0).days + 1
    assert sum(r.n_events for r in rows) == read_table(
        spark, sf_dir, "events"
    ).count()


def test_reconcile_totals_match_type_counts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    rows = ea.events_daily_reconcile(spark, sf_dir).collect()
    assert sum(r.n_clicks for r in rows) == ev.where("event_type = 'click'").count()
    assert (
        sum(r.n_purchases for r in rows)
        == ev.where("event_type = 'purchase'").count()
    )
    for r in rows:
        assert r.click_excess == r.n_clicks - r.n_purchases
