package graft.ops

import graft.SparkSpec
import scala.util.Random

/** BPE tokenizer training: the merge sequence must match a hand-run of
  * the classic algorithm, and duplicated-span detection must honor its
  * window guarantee on randomized planted runs.
  */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("bpeLearn reproduces the hand-computed merge sequence") {
    // corpus: "aaab" x3, "aab" x2  (as repeated tokens in documents)
    val docs = Seq(
      (1L, "aaab aaab"), (2L, "aaab aab"), (3L, "aab")
    ).toDF("doc_id", "text")
    // symbols: aaab -> a a a b </w> (cnt 3), aab -> a a b </w> (cnt 2)
    // round 1 pairs: (a,a): 2*3+1*2=8, (a,b): 5, (b,</w>): 5 -> merge (a,a)
    // round 2: aaab -> aa a b </w>, aab -> aa b </w>
    //   pairs: (aa,a): 3, (a,b): 3, (aa,b): 2, (b,</w>): 5 -> merge (b,</w>)
    // round 3: pairs: (aa,a): 3, (a,b</w>): 3, (aa,b</w>): 2
    //   -> tie 3 vs 3: (a,b</w>) < (aa,a) lexicographically -> merge (a,b</w>)
    val merges = CorpusOps.bpeLearn(docs, nMerges = 3)
    assert(merges == Seq(("a", "a", 8L), ("b", "</w>", 5L), ("a", "b</w>", 3L)))
    // the distributed tier (forced via threshold 0) must agree exactly
    assert(CorpusOps.bpeLearn(docs, nMerges = 3, localVocabThreshold = 0L) == merges)
  }

  test("bpeTokenize applies learned merges greedily in merge order") {
    val docs = Seq(
      (1L, "aaab aaab"), (2L, "aaab aab"), (3L, "aab")
    ).toDF("doc_id", "text")
    val merges = CorpusOps.bpeLearn(docs, nMerges = 3)
    // aaab: a a a b </w> -> aa a b </w> -> aa a b</w> -> aa ab</w>  (2 pieces)
    // aab:  a a b </w>   -> aa b </w>   -> aa b</w>  (a,b</w> blocked by aa)
    val out = CorpusOps.bpeTokenize(docs, merges.map(m => (m._1, m._2)))
      .select("doc_id", "pieces", "n_pieces")
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == Seq("aa", "ab</w>", "aa", "ab</w>") && out(1L)._3 == 4L)
    assert(out(2L)._2 == Seq("aa", "ab</w>", "aa", "b</w>"))
    assert(out(3L)._2 == Seq("aa", "b</w>") && out(3L)._3 == 2L)
    // round trip: pieces concatenated (sans markers) reproduce the words
    val flat = out(1L)._2.mkString.replace("</w>", " ").trim
    assert(flat == "aaab aaab")
  }

  test("batched bpeLearn is greedy-equivalent: batch=8/32 reproduce the " +
    "batch=1 merge sequence on randomized corpora") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val alphabet = "abcde"
      // skewed word lengths and repeat counts — enough pair collisions
      // that batching has real interference decisions to make
      val words = (0 until 60).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w))
      val docs = rnd.shuffle(text).grouped(20).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      // threshold 0 forces the distributed tier — otherwise these tiny
      // vocabularies would all take the local fast path
      val sequential = CorpusOps.bpeLearn(docs, nMerges = 15, batch = 1,
        localVocabThreshold = 0L)
      assert(CorpusOps.bpeLearn(docs, nMerges = 15, batch = 8,
          localVocabThreshold = 0L) == sequential,
        s"seed=$seed: batch=8 diverged from the sequential merge sequence")
      assert(CorpusOps.bpeLearn(docs, nMerges = 15, batch = 32,
          localVocabThreshold = 0L) == sequential,
        s"seed=$seed: batch=32 diverged from the sequential merge sequence")
      assert(CorpusOps.bpeLearn(docs, nMerges = 15) == sequential,
        s"seed=$seed: local tier diverged from the distributed merge sequence")
    }
  }

  test("local tier matches the distributed tier on longer merge horizons " +
    "and multi-char symbol collisions") {
    for (seed <- 10 to 12) {
      val rnd = new Random(seed)
      // tiny alphabet + long words: merged symbols ("aa", "ab"...) keep
      // colliding with later pair candidates, stressing the incremental
      // index update and the UTF-8 tie-break on equal counts
      val alphabet = "ab"
      val words = (0 until 40).map { _ =>
        val len = 2 + rnd.nextInt(9)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w))
      val docs = rnd.shuffle(text).grouped(15).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val dist = CorpusOps.bpeLearn(docs, nMerges = 40, batch = 1,
        localVocabThreshold = 0L)
      val local = CorpusOps.bpeLearn(docs, nMerges = 40)
      assert(local == dist, s"seed=$seed: local tier diverged")
    }
  }

  test("tier boundary: threshold exactly at / one below the vocab size " +
    "flips the tier without changing the merge sequence") {
    val rnd = new Random(99)
    val words = (0 until 30).map { _ =>
      (0 until 2 + rnd.nextInt(7)).map(_ => "abc"(rnd.nextInt(3))).mkString
    }
    val docs = rnd.shuffle(words.flatMap(w => Seq.fill(1 + rnd.nextInt(3))(w)))
      .grouped(12).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    // the threshold compares against the DISTINCT word count — compute it
    // with the same tokenizer bpeLearn uses
    import org.apache.spark.sql.functions.{col, explode, lower}
    val vocab = docs
      .select(explode(graft.functions.CrossHash.tokens(lower(col("text")))).as("w"))
      .distinct().count()
    // == threshold → local tier (<=); one below → distributed tier
    val local = CorpusOps.bpeLearn(docs, nMerges = 25, batch = 1,
      localVocabThreshold = vocab)
    val dist = CorpusOps.bpeLearn(docs, nMerges = 25, batch = 1,
      localVocabThreshold = vocab - 1)
    assert(local == dist, "tier flip at the boundary changed the merges")
  }

  test("bpeLearn stops early when no pairs remain") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    // every word is one char + </w>: exactly one merge family per word,
    // then singleton symbols — far fewer than the requested 50 merges
    val merges = CorpusOps.bpeLearn(docs, nMerges = 50)
    assert(merges.size < 50 && merges.nonEmpty)
    assert(merges.head == (("x", "</w>", 1L)) ||
      merges.head._2 == "</w>") // first merges glue chars to the marker
  }

  test("duplicatedSpans window guarantee: planted >=k-token shared runs always surface") {
    val k = 8
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      def uniqueWords(p: String, n: Int): Seq[String] =
        (0 until n).map(i => s"$p${seed}x$i")
      // a shared run of exactly k + extra tokens planted inside two
      // otherwise-disjoint documents at random offsets
      val run = uniqueWords("r", k + rnd.nextInt(4))
      val d1 = uniqueWords("a", rnd.nextInt(10)) ++ run ++ uniqueWords("b", rnd.nextInt(10))
      val d2 = uniqueWords("c", rnd.nextInt(10)) ++ run ++ uniqueWords("d", rnd.nextInt(10))
      val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
        .toDF("doc_id", "text")
      val spans = DedupOps.duplicatedSpans(docs, k = k)
        .select("span").as[String].collect()
      // every detected span must lie inside the planted run, and the run
      // must surface as exactly (len - k + 1) shared windows
      val runStr = run.mkString(" ")
      assert(spans.nonEmpty, s"seed=$seed: planted run of ${run.size} not detected")
      assert(spans.forall(runStr.contains), s"seed=$seed: false positive outside run")
      assert(spans.length == run.size - k + 1, s"seed=$seed: window count off")
    }
  }
}
