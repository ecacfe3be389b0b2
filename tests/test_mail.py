"""Round-9 mbox/MIME tests (operators/mail.py) behind q435."""

import base64

import pytest

from rust_dataframe_spark.operators.mail import (
    MailError,
    mbox_messages,
    parse_email,
    split_mbox,
    strip_quotes,
)

MSG1 = b"""From alice@ex.org Mon Jan  5 10:00:00 2026
From: Alice <alice@ex.org>
Subject: Hello world
Message-ID: <m1@ex.org>
Content-Type: text/plain; charset=utf-8

Body line one
>From the archive
Second line
--\x20
sig
"""

MSG2 = ("""From bob@ex.org Mon Jan  5 11:00:00 2026
From: Bob <bob@ex.org>
Subject: =?utf-8?q?Re=3A_Hello?=
Message-ID: <m2@ex.org>
MIME-Version: 1.0
Content-Type: multipart/mixed; boundary="BB"

--BB
Content-Type: text/plain; charset=utf-8
Content-Transfer-Encoding: quoted-printable

Alice wrote:
> Body line one
My reply caf=C3=A9
--BB
Content-Type: application/pdf
Content-Transfer-Encoding: base64
Content-Disposition: attachment; filename="x.pdf"

"""
        + base64.b64encode(b"PDF").decode()
        + "\n--BB--\n").encode()


class TestMail:
    def test_mbox_split_and_unstuff(self):
        msgs = split_mbox(MSG1 + b"\n" + MSG2)
        assert len(msgs) == 2
        m = parse_email(msgs[0])
        assert "From the archive" in m["text"]  # >From unstuffed
        with pytest.raises(MailError, match="From line"):
            split_mbox(b"not an mbox")

    def test_mime_walk_decodes_and_counts_attachments(self):
        m = parse_email(split_mbox(MSG2)[0])
        assert m["subject"] == "Re: Hello"  # RFC 2047
        assert m["n_attachments"] == 1
        assert "café" in m["text"]  # quoted-printable + charset

    def test_quote_sig_stripping(self):
        m1 = parse_email(split_mbox(MSG1)[0])
        c = strip_quotes(m1["text"])
        assert "sig" not in c and c.splitlines()[-1] == "Second line"
        m2 = parse_email(split_mbox(MSG2)[0])
        c2 = strip_quotes(m2["text"])
        assert "wrote:" not in c2 and ">" not in c2
        assert c2.strip() == "My reply café"

    def test_html_only_gates(self):
        raw = (b"From x@y Mon Jan  5 10:00:00 2026\nFrom: x@y\n"
               b"Content-Type: text/html\n\n<p>hi</p>\n")
        with pytest.raises(MailError, match="text/plain"):
            parse_email(split_mbox(raw)[0])

    def test_spark_explode(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(MSG1 + b"\n" + MSG2))]
        )
        out = mbox_messages(df).orderBy("msg_idx").collect()
        assert [(r.msg_idx, r.subject, r.n_attachments) for r in out] == [
            (0, "Hello world", 0), (1, "Re: Hello", 1),
        ]
        assert out[1].n_tokens == 3  # "My reply café"
