"""Source parsers against reference-format micro-fixtures (the same
FORMATS as /root/reference tests/fixtures, content written fresh)."""

import os

from streaming_cdc_spark.sources.aida import aida_mentions, read_aida
from streaming_cdc_spark.sources.mentions import (
    build_entity_vocab,
    read_cluster_pairs,
    read_dendrogram,
    read_embeddings_tsv,
    read_mentions_jsonl,
    with_stream_index,
    write_cluster_pairs,
    write_dendrogram,
)
from streaming_cdc_spark.sources.pubtator import pubtator_mentions, read_pubtator

PUBTATOR = (
    "9001|t|Alpha study\n"
    "9001|a|Beta gamma delta\n"
    "9001\t0\t5\tAlpha\tT1,T2\tC100\n"
    "9001\t17\t22\tgamma\tT3\tC200\n"
    "\n"
    "9002|t|Second doc\n"
    "9002|a|More text here\n"
    "9002\t0\t6\tSecond\tT1\tC100\n"
    "\n"
)

AIDA = (
    "-DOCSTART- (1 testdoc)\n"
    "Obama\tB\tObama\tBarack_Obama\n"
    "visited\n"
    "Paris\tB\tParis\tParis_France\n"
    "today\n"
    "-DOCSTART- (2 other)\n"
    "Nothing\tB\tNothing\t--NME--\n"
    "happened\n"
)


def test_pubtator_roundtrip(spark, tmp_path):
    p = tmp_path / "docs.pubtator"
    p.write_text(PUBTATOR)
    docs = read_pubtator(spark, str(p))
    got = {r["pmid"]: r for r in docs.collect()}
    assert set(got) == {"9001", "9002"}
    assert got["9001"]["title"] == "Alpha study"
    assert got["9001"]["abstract"] == "Beta gamma delta"
    ms = got["9001"]["mentions"]
    assert [(m["start"], m["end"], m["text"]) for m in ms] == [(0, 5, "Alpha"), (17, 22, "gamma")]
    assert ms[0]["semantic_types"] == ["T1", "T2"]

    mentions = pubtator_mentions(docs).collect()
    by_key = {(m["document_id"], m["mention_pos"]): m for m in mentions}
    m0 = by_key[("9001", 0)]
    # full text = 'Alpha study Beta gamma delta'; span [0,5) = 'Alpha'
    assert m0["mention"] == "Alpha"
    assert m0["left_context"] == ""
    assert m0["right_context"] == " study Beta gamma delta"
    m1 = by_key[("9001", 1)]
    # spans index into title+' '+abstract: [17,22) = 'gamma'
    assert m1["mention"] == "gamma"
    assert m1["left_context"] == "Alpha study Beta "
    assert m1["right_context"] == " delta"


def test_aida_parse(spark, tmp_path):
    p = tmp_path / "aida.tsv"
    p.write_text(AIDA)
    docs = read_aida(spark, str(p))
    got = {r["document_id"]: r for r in docs.collect()}
    assert set(got) == {"1 testdoc", "2 other"}
    assert got["1 testdoc"]["text"] == "Obama visited Paris today"
    spans = [(m["start"], m["end"], m["entity_id"]) for m in got["1 testdoc"]["mentions"]]
    assert spans == [(0, 5, "Barack_Obama"), (14, 19, "Paris_France")]

    mentions = aida_mentions(docs).collect()
    surfaces = {(m["document_id"], m["mention"]) for m in mentions}
    assert ("1 testdoc", "Obama") in surfaces
    assert ("1 testdoc", "Paris") in surfaces
    assert all(m["entity_id"] != "--NME--" for m in mentions)


def test_mentions_jsonl_and_index(spark, tmp_path):
    p = tmp_path / "mentions.jsonl"
    p.write_text(
        '{"mention": "a", "entity_id": "E1", "document_id": "d1"}\n'
        '{"mention": "b", "entity_id": "E2", "document_id": "d1"}\n'
    )
    df = read_mentions_jsonl(spark, str(p))
    assert df.count() == 2
    indexed = with_stream_index(df.drop("mention_index"), ["document_id", "mention"])
    got = {r["mention"]: r["mention_index"] for r in indexed.collect()}
    assert got == {"a": 0, "b": 1}


def test_embeddings_tsv(spark, tmp_path):
    p = tmp_path / "emb.tsv"
    p.write_text("0\tE1\t0.5\t1.5\n1\tE2\t-1.0\t2.0\n")
    df = read_embeddings_tsv(spark, str(p))
    got = {r["mention_index"]: r for r in df.collect()}
    assert got[0]["entity_id"] == "E1"
    assert got[0]["embedding"] == [0.5, 1.5]
    assert got[1]["embedding"] == [-1.0, 2.0]


def test_entity_vocab(spark):
    df = spark.createDataFrame(
        [("E1",), ("E1",), ("E2",), ("E3",), ("E3",), ("E3",)], "entity_id string"
    )
    vocab = {r["index"]: (r["entity_id"], r["count"]) for r in build_entity_vocab(df).collect()}
    assert vocab[0] == ("[PAD]", 0)
    assert vocab[1] == ("E3", 3)
    assert vocab[2] == ("E1", 2)
    assert vocab[3] == ("E2", 1)


def test_cluster_pairs_roundtrip(spark, tmp_path):
    path = os.path.join(tmp_path, "pairs")
    df = spark.createDataFrame([(0, 1, 1), (1, 1, 2)], "mention_index long, true_id long, pred_id long")
    write_cluster_pairs(df, path)
    back = read_cluster_pairs(spark, path)
    assert sorted(map(tuple, back.collect())) == [(0, 1, 1), (1, 1, 2)]


def test_dendrogram_roundtrip(spark, tmp_path):
    path = os.path.join(tmp_path, "tree")
    df = spark.createDataFrame(
        [("0", None, None), ("a", "0", "white"), ("1", "0", None)],
        "uid string, parent_uid string, label string",
    )
    write_dendrogram(df, path)
    back = {r["uid"]: (r["parent_uid"], r["label"]) for r in read_dendrogram(spark, path).collect()}
    assert back == {"0": (None, None), "a": ("0", "white"), "1": ("0", None)}


def test_write_embeddings_tsv_stdout(spark):
    """S13: id\tlabel\tv1..vN lines, reference row format
    (encode_mentions.py:120-122)."""
    import io

    from streaming_cdc_spark.sources.mentions import write_embeddings_tsv_stdout

    df = spark.createDataFrame(
        [(0, 7, [1.0, -0.5]), (1, 8, [0.25, 2.0])],
        "vec_id long, label long, embedding array<double>",
    )
    buf = io.StringIO()
    n = write_embeddings_tsv_stdout(df.orderBy("vec_id"), out=buf)
    assert n == 2
    assert buf.getvalue().splitlines() == ["0\t7\t1.0\t-0.5", "1\t8\t0.25\t2.0"]


def test_mentions_jsonl_malformed_lines(spark, tmp_path):
    """Interchange robustness: invalid JSON, wrong field types, and
    missing fields must not throw (PERMISSIVE schema read) — bad
    lines null out, good lines survive, ANSI mode notwithstanding."""
    import json

    p = tmp_path / "m.jsonl"
    good = {
        "left_context": "a", "mention": "m", "right_context": "b",
        "entity_id": "E1", "mention_index": 0,
    }
    lines = [
        json.dumps(good),
        "{not json at all",
        json.dumps({**good, "mention_index": "NaNsense"}),  # wrong type
        json.dumps({"mention": "only-this-field"}),  # missing fields
        "",
    ]
    p.write_text("\n".join(lines))
    from streaming_cdc_spark.sources.mentions import read_mentions_jsonl

    df = read_mentions_jsonl(spark, str(p))
    rows = df.collect()
    ok = [r for r in rows if r["entity_id"] == "E1" and r["mention_index"] == 0]
    assert len(ok) == 1  # the good line parses
    # no exception raised on any malformed line, partial rows allowed
    assert any(r["mention"] == "only-this-field" for r in rows)


def test_embeddings_tsv_malformed_lines(spark, tmp_path):
    """Short rows and non-numeric vector components null out instead
    of throwing (try-cast semantics under ANSI)."""
    p = tmp_path / "e.tsv"
    p.write_text("0\tE1\t0.5\t0.25\nnot_a_number\tE2\t0.5\tbad\n1\tE3\n")
    from streaming_cdc_spark.sources.mentions import read_embeddings_tsv

    df = read_embeddings_tsv(spark, str(p))
    rows = {r["entity_id"]: r for r in df.collect()}
    assert rows["E1"]["mention_index"] == 0 and rows["E1"]["embedding"] == [0.5, 0.25]
    assert rows["E2"]["mention_index"] is None
    assert rows["E3"]["embedding"] == []


def test_pubtator_malformed_block(spark, tmp_path):
    """Truncated mention rows and non-numeric spans null out instead
    of failing the scan under ANSI mode."""
    p = tmp_path / "bad.pubtator"
    p.write_text(
        "123|t|A title\n"
        "123|a|An abstract\n"
        "123\tnot_an_int\t5\tspan text\tT1,T2\tE9\n"
        "123\t0\n"  # truncated row
    )
    from streaming_cdc_spark.sources.pubtator import read_pubtator

    doc = read_pubtator(spark, str(p)).collect()[0]
    assert doc["pmid"] == "123" and doc["title"] == "A title"
    m0, m1 = doc["mentions"]
    assert m0["start"] is None and m0["end"] == 5 and m0["entity_id"] == "E9"
    assert m1["end"] is None and m1["text"] is None
