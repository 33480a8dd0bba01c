package graft.sources

import graft.SparkSpec
import scala.util.Random

/** Property-style tests for the envelope adapters: randomized wal2json
  * and Debezium documents (multi-change transactions, missing oldkeys,
  * null images, unknown kinds, schema-change docs interleaved) must
  * normalize to exactly the event sequence an in-memory reference
  * derives — counts, actions, action_seq, and routing columns. Values
  * are generated integer-only so variant canonicalization is the
  * identity and image CONTENT can be asserted too (which image fed
  * which half). Seeded generation, no scalacheck bridge (same
  * convention as AsofPropertySpec).
  */
class CdcEnvelopesPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Exp(schema: String, table: String, action: String,
                         seq: Int, imageId: Option[Long])

  test("wal2json: randomized transactions match the reference expansion (6 seeds)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed * 41L)
      val docs = scala.collection.mutable.ArrayBuffer.empty[String]
      val expected = scala.collection.mutable.ArrayBuffer.empty[Exp]
      for (_ <- 0 until 20) {
        val nChanges = rnd.nextInt(4) // 0..3: empty transactions too
        val parts = (0 until nChanges).map { _ =>
          val table = s"t${rnd.nextInt(3)}"
          val id = rnd.nextInt(1000).toLong
          val kind = rnd.nextInt(5) match {
            case 0 => "insert"; case 1 => "update"; case 2 => "delete"
            case 3 => "truncate"; case _ => "update"
          }
          val hasOld = rnd.nextBoolean()
          val newImg =
            s""""columnnames":["id","v"],"columnvalues":[$id,${rnd.nextInt(100)}]"""
          val oldId = rnd.nextInt(1000).toLong
          val oldKeys = s""","oldkeys":{"keynames":["id"],"keyvalues":[$oldId]}"""
          kind match {
            case "insert" =>
              expected += Exp("s", table, "insert", 2, Some(id))
              s"""{"kind":"insert","schema":"s","table":"$table",$newImg}"""
            case "update" =>
              // delete half prefers oldkeys; falls back to the new image
              expected += Exp("s", table, "delete", 1, if (hasOld) Some(oldId) else Some(id))
              expected += Exp("s", table, "insert", 2, Some(id))
              s"""{"kind":"update","schema":"s","table":"$table",$newImg${if (hasOld) oldKeys else ""}}"""
            case "delete" =>
              expected += Exp("s", table, "delete", 1, Some(oldId))
              s"""{"kind":"delete","schema":"s","table":"$table"$oldKeys}"""
            case _ => // dropped kinds contribute nothing
              s"""{"kind":"$kind","schema":"s","table":"$table"}"""
          }
        }
        docs += parts.mkString("""{"change":[""", ",", "]}")
      }
      val out = CdcEnvelopes.wal2json(docs.toSeq.toDF("json"),
          eventUnixtime = org.apache.spark.sql.functions.lit(7L))
        .select("schema", "table", "action", "values", "action_seq")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getInt(4)))
      assert(out.length == expected.length, s"seed=$seed count")
      out.zip(expected).zipWithIndex.foreach { case (((sc, tb, ac, vs, sq), e), i) =>
        assert(sc == e.schema && tb == e.table && ac == e.action && sq == e.seq,
          s"seed=$seed row $i: ($sc,$tb,$ac,$sq) != $e")
        // the image that fed this half is identified by its id value
        e.imageId.foreach(id => assert(vs.contains(s""""id":$id"""),
          s"seed=$seed row $i: values $vs missing id $id"))
      }
    }
  }

  test("debezium: randomized op mix incl. schema-change docs matches the reference (6 seeds)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed * 97L)
      val docs = scala.collection.mutable.ArrayBuffer.empty[String]
      val expected = scala.collection.mutable.ArrayBuffer.empty[Exp]
      for (_ <- 0 until 40) {
        val table = s"t${rnd.nextInt(3)}"
        val id = rnd.nextInt(1000).toLong
        val before = s"""{"id":$id,"v":${rnd.nextInt(100)}}"""
        val id2 = rnd.nextInt(1000).toLong
        val after = s"""{"id":$id2,"v":${rnd.nextInt(100)}}"""
        val wrap = rnd.nextBoolean() // payload wrapper on/off per doc
        def doc(body: String) =
          if (wrap) s"""{"payload":{$body}}""" else s"""{$body}"""
        val src = s""""source":{"db":"d","table":"$table"},"ts_ms":5"""
        rnd.nextInt(6) match {
          case 0 =>
            expected += Exp("d", table, "insert", 2, Some(id2))
            docs += doc(s""""before":null,"after":$after,$src,"op":"c"""")
          case 1 =>
            expected += Exp("d", table, "insert", 2, Some(id2))
            docs += doc(s""""after":$after,$src,"op":"r"""")
          case 2 =>
            val nullBefore = rnd.nextBoolean() // REPLICA IDENTITY NONE
            expected += Exp("d", table, "delete", 1, Some(if (nullBefore) id2 else id))
            expected += Exp("d", table, "insert", 2, Some(id2))
            docs += doc(s""""before":${if (nullBefore) "null" else before},"after":$after,$src,"op":"u"""")
          case 3 =>
            expected += Exp("d", table, "delete", 1, Some(id))
            docs += doc(s""""before":$before,"after":null,$src,"op":"d"""")
          case 4 => // truncate/message: dropped
            docs += doc(s"""$src,"op":"${if (rnd.nextBoolean()) "t" else "m"}"""")
          case _ => // schema-change document: no op, a ddl string
            expected += Exp("d", table, "query", 0, None)
            docs += doc(s"""$src,"databaseName":"d","ddl":"ALTER TABLE $table ADD COLUMN c$id INT"""")
        }
      }
      val out = CdcEnvelopes.debezium(docs.toSeq.toDF("json"))
        .select("schema", "table", "action", "values", "action_seq")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getInt(4)))
      assert(out.length == expected.length, s"seed=$seed count")
      out.zip(expected).zipWithIndex.foreach { case (((sc, tb, ac, vs, sq), e), i) =>
        assert(sc == e.schema && tb == e.table && ac == e.action && sq == e.seq,
          s"seed=$seed row $i: ($sc,$tb,$ac,$sq) != $e")
        e.imageId.foreach(id => assert(vs.contains(s""""id":$id"""),
          s"seed=$seed row $i: values $vs missing id $id"))
        if (ac == "query") assert(vs.startsWith("ALTER TABLE"),
          s"seed=$seed row $i: query values must be the raw DDL, got $vs")
      }
    }
  }
}
