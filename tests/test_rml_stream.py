"""Streaming RML conversion (`streaming/rml_stream.py`): the compiled
mapping plan over a file-arrival stream — batch/stream equality, true
incrementality via checkpoints, stream-static ROM joins, loud guards."""

import os
import tempfile

import pytest

from pyrml_spark import convert
from pyrml_spark.compiler import CompileError
from pyrml_spark.sources import SourceError
from pyrml_spark.streaming.rml_stream import convert_stream

PRELUDE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://ex.com/> .
"""

_NATION_MAP = PRELUDE + """
<#Nation> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{key}" ;
                  rr:class ex:Nation ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name" ] ] .
"""


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("key,name\n")
        for k, n in rows:
            f.write(f"{k},{n}\n")


def _drain_to_parquet(sdf, out_dir, ckpt):
    q = (sdf.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def _triples(df):
    return {tuple(r) for r in df.select("s", "p", "o", "g").collect()}


def test_stream_matches_batch_csv(spark):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        _write_csv(os.path.join(src, "a.csv"), [(1, "alpha"), (2, "beta")])
        _write_csv(os.path.join(src, "b.csv"), [(3, "gamma"), (1, "alpha")])
        mfile = os.path.join(d, "m.ttl")
        with open(mfile, "w") as f:
            f.write(_NATION_MAP.replace("{{ dir }}", src))

        out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
        sdf = convert_stream(spark, mfile, stream_source=src)
        assert sdf.isStreaming
        _drain_to_parquet(sdf, out, ckpt)

        got = _triples(spark.read.parquet(out))
        exp = _triples(convert(spark, mfile))
        assert got == exp
        # the duplicate (1, alpha) row dedups within the watermark horizon
        assert len(got) == 3 * 2  # 3 nations × (rdf:type, ex:name)


def test_stream_incremental_checkpoint(spark):
    """A second availableNow drain with the same checkpoint processes ONLY
    the newly-arrived file — per-microbatch work scales with arriving
    data, not corpus size."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        _write_csv(os.path.join(src, "a.csv"), [(1, "alpha")])
        mfile = os.path.join(d, "m.ttl")
        with open(mfile, "w") as f:
            f.write(_NATION_MAP.replace("{{ dir }}", src))

        out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
        _drain_to_parquet(convert_stream(spark, mfile, stream_source=src),
                          out, ckpt)
        n_first = spark.read.parquet(out).count()
        assert n_first == 2  # type + name

        _write_csv(os.path.join(src, "b.csv"), [(2, "beta")])
        _drain_to_parquet(convert_stream(spark, mfile, stream_source=src),
                          out, ckpt)
        rows = spark.read.parquet(out).collect()
        # 4 triples total, NO re-emission of file a's rows
        assert len(rows) == 4
        assert len({tuple(r) for r in rows}) == 4


_JOIN_MAP = PRELUDE + """
<#Nation> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{key}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:region ;
    rr:objectMap [ rr:parentTriplesMap <#Region> ;
      rr:joinCondition [ rr:child "rkey" ; rr:parent "rkey" ] ] ] .
<#Region> rml:logicalSource [ rml:source "{{ regions }}" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/region/{rkey}" ] .
"""


def test_stream_static_rom_join(spark):
    """Streaming child × static parent = a stream-static equi-join, the
    broadcast-dimension pattern; static parent branch excluded with a
    warning."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        with open(os.path.join(src, "a.csv"), "w") as f:
            f.write("key,rkey\n1,10\n2,20\n3,10\n")
        regions = os.path.join(d, "regions.csv")
        with open(regions, "w") as f:
            f.write("rkey\n10\n20\n")
        mapping = (_JOIN_MAP.replace("{{ dir }}", src)
                   .replace("{{ regions }}", regions))

        out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
        with pytest.warns(UserWarning, match="excluding static"):
            sdf = convert_stream(spark, mapping, stream_source=src,
                                 on_static="exclude")
        _drain_to_parquet(sdf, out, ckpt)
        got = _triples(spark.read.parquet(out))
        assert got == {
            ("<http://ex.com/nation/1>", "<http://ex.com/region>",
             "<http://ex.com/region/10>", None),
            ("<http://ex.com/nation/2>", "<http://ex.com/region>",
             "<http://ex.com/region/20>", None),
            ("<http://ex.com/nation/3>", "<http://ex.com/region>",
             "<http://ex.com/region/10>", None),
        }


_JSON_MAP = PRELUDE + """
<#J> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$.items[*]" ] ;
  rr:subjectMap [ rr:template "http://ex.com/item/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:label ;
    rr:objectMap [ rml:reference "label" ] ] .
"""


def test_stream_json_iterator(spark):
    """The JSONPath iterator program (struct access + explode) runs
    unchanged on the streaming scan."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "docs")
        os.mkdir(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            f.write('{"items": [{"id": 1, "label": "x"},'
                    ' {"id": 2, "label": "y"}]}')
        mapping = _JSON_MAP.replace("{{ dir }}", src)
        out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
        _drain_to_parquet(
            convert_stream(spark, mapping, stream_source=src), out, ckpt)
        got = _triples(spark.read.parquet(out))
        assert got == {
            ("<http://ex.com/item/1>", "<http://ex.com/label>", '"x"', None),
            ("<http://ex.com/item/2>", "<http://ex.com/label>", '"y"', None),
        }


def test_stream_static_join_broadcasts(spark):
    """100 TB lens: the stream-static ROM join must broadcast the
    dimension parent, not shuffle the stream."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        with open(os.path.join(src, "a.csv"), "w") as f:
            f.write("key,rkey\n1,10\n")
        regions = os.path.join(d, "regions.csv")
        with open(regions, "w") as f:
            f.write("rkey\n10\n")
        mapping = (_JOIN_MAP.replace("{{ dir }}", src)
                   .replace("{{ regions }}", regions))
        with pytest.warns(UserWarning, match="excluding static"):
            sdf = convert_stream(spark, mapping, stream_source=src,
                                 on_static="exclude")
        q = (sdf.writeStream.format("noop")
             .option("checkpointLocation", os.path.join(d, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        plan = q._jsq.explainInternal(False)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, \
            plan


def test_write_triples_stream_exact_dedup(spark):
    """The foreachBatch table sink keeps EXACT set semantics across
    horizons: a fresh checkpoint re-offers every file (simulating
    re-arrival beyond the watermark), and the bucket-pruned anti-join
    drops the already-written triples while appending the new ones."""
    from pyrml_spark.streaming.rml_stream import write_triples_stream

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        _write_csv(os.path.join(src, "a.csv"), [(1, "alpha"), (2, "beta")])
        mfile = os.path.join(d, "m.ttl")
        with open(mfile, "w") as f:
            f.write(_NATION_MAP.replace("{{ dir }}", src))
        table = os.path.join(d, "triples_tbl")

        q = write_triples_stream(
            convert_stream(spark, mfile, stream_source=src),
            table, os.path.join(d, "ckpt1"))
        q.awaitTermination(120)
        assert spark.read.parquet(table).count() == 4  # 2 nations × 2

        # fresh checkpoint → files re-offered; plus one genuinely new file
        _write_csv(os.path.join(src, "b.csv"), [(3, "gamma"), (1, "alpha")])
        q = write_triples_stream(
            convert_stream(spark, mfile, stream_source=src),
            table, os.path.join(d, "ckpt2"))
        q.awaitTermination(120)
        rows = spark.read.parquet(table).select("s", "p", "o", "g").collect()
        assert len(rows) == 6                      # no duplicate appends
        assert len({tuple(r) for r in rows}) == 6
        # and the table keeps its bucketed layout
        assert "subject_bucket" in spark.read.parquet(table).columns


def test_stream_guards(spark):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "nations")
        os.mkdir(src)
        _write_csv(os.path.join(src, "a.csv"), [(1, "alpha")])
        mapping = _NATION_MAP.replace("{{ dir }}", src)

        # source name that matches no TriplesMap
        with pytest.raises(CompileError, match="no TriplesMap reads"):
            convert_stream(spark, mapping, stream_source="/nowhere")

        # static TriplesMap present → loud by default
        two = mapping + """
<#Other> rml:logicalSource [ rml:source "%s" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/o/{key}" ] .
""" % os.path.join(src, "a.csv")
        with pytest.raises(CompileError, match="on_static"):
            convert_stream(spark, two, stream_source=src)

        # stream-stream self-join rejected
        self_join = PRELUDE + """
<#A> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/a/{key}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:peer ;
    rr:objectMap [ rr:parentTriplesMap <#B> ;
      rr:joinCondition [ rr:child "key" ; rr:parent "key" ] ] ] .
<#B> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/b/{key}" ] .
""".replace("{{ dir }}", src)
        with pytest.raises(CompileError, match="stream-stream"):
            convert_stream(spark, self_join, stream_source=src)

        # non-file source kinds can't stream
        xml_map = PRELUDE + """
<#X> rml:logicalSource [ rml:source "{{ dir }}" ;
    rml:referenceFormulation ql:XPath ; rml:iterator "/r/x" ] ;
  rr:subjectMap [ rr:template "http://ex.com/x/{k}" ] .
""".replace("{{ dir }}", src)
        with pytest.raises(SourceError, match="streaming RML supports"):
            convert_stream(spark, xml_map, stream_source=src).printSchema()


def test_hadoop_path_exists(spark, tmp_path):
    """The exact-dedup gate's existence probe goes through the Hadoop
    FileSystem API so it answers for any Spark-reachable URI, not just
    local paths (os.path.exists is always False on s3a://...)."""
    from pyrml_spark.streaming.rml_stream import _hadoop_path_exists

    p = str(tmp_path / "t.parquet")
    assert not _hadoop_path_exists(spark, p)
    spark.range(3).write.parquet(p)
    assert _hadoop_path_exists(spark, p)
    # scheme-qualified URI resolves through the same FS machinery
    assert _hadoop_path_exists(spark, "file:" + p)
    assert not _hadoop_path_exists(spark, "file:" + p + ".nope")


def test_hadoop_path_exists_empty_vs_corrupt(spark, tmp_path):
    """UNABLE_TO_INFER_SCHEMA is ambiguous (ADVICE r6): an empty /
    metadata-only directory means "table absent" (gate may write fresh),
    but a directory holding an unreadable data file is a partial/corrupt
    earlier write — the probe must re-raise, never blind-append."""
    import pytest

    from pyrml_spark.streaming.rml_stream import _hadoop_path_exists

    empty = tmp_path / "empty_dir"
    empty.mkdir()
    assert not _hadoop_path_exists(spark, str(empty))

    meta_only = tmp_path / "meta_only"
    meta_only.mkdir()
    (meta_only / "_SUCCESS").write_text("")
    assert not _hadoop_path_exists(spark, str(meta_only))

    # a visible data file parquet cannot read must raise (footer error at
    # .schema, or the probe's re-raise when only the listing-level
    # UNABLE_TO_INFER_SCHEMA fires) — never a silent False
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception):
        _hadoop_path_exists(spark, str(corrupt))
