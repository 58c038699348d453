"""PII redaction: known strings, pass ordering, clean docs untouched."""

from osm_to_netex_spark.operators import textstats


def test_redaction_cases(spark):
    rows = [
        (1, "reach me at jane.doe+spam@sub.example.org thanks"),
        (2, "server 192.168.1.254 timed out"),
        (3, "call +47 22 33 44 55 or (555) 123-4567 now"),
        (4, "no pii here just words"),
        (5, "both bob@x.io and 10.0.0.1 and +1 800 555 0199"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textstats.redact_pii(docs).collect()}
    assert got[1].clean_text == "reach me at <EMAIL> thanks"
    assert got[1].n_emails == 1 and got[1].n_ips == 0
    assert got[2].clean_text == "server <IP> timed out"
    assert got[3].n_phones == 2 and "<PHONE>" in got[3].clean_text
    assert got[4].clean_text == rows[3][1]
    assert (got[4].n_emails, got[4].n_ips, got[4].n_phones) == (0, 0, 0)
    r5 = got[5]
    assert r5.n_emails == 1 and r5.n_ips == 1 and r5.n_phones == 1
    assert "<EMAIL>" in r5.clean_text and "<IP>" in r5.clean_text and "<PHONE>" in r5.clean_text
    # no raw address survives
    assert "bob@" not in r5.clean_text and "10.0.0.1" not in r5.clean_text
