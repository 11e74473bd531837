package graft.capture

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the parser/classifier operators (SURVEY.md §5:
  * "ScalaCheck properties for classifiers/parsers (O2, O9, O18)"). Uses raw
  * ScalaCheck generators with fixed seeds (scalatestplus isn't in the
  * offline cache) and batch-evaluates every case through Spark so the tested
  * path is the real Catalyst expression, not a Scala reimplementation. */
class CapturePropsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("O2: version gate agrees with the [2.2, 4.0) spec on arbitrary majors/minors") {
    val gen = for {
      maj <- Gen.chooseNum(0, 9); min <- Gen.chooseNum(0, 30)
      patch <- Gen.option(Gen.chooseNum(0, 99))
    } yield (maj, min, s"$maj.$min${patch.map("." + _).getOrElse("")}")
    val cases = sample(gen, 300).distinctBy(_._3)
    val got = cases.map(_._3).toDF("v")
      .select($"v", CaptureOps.supportedVersion($"v").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (maj, min, v) =>
      val want = (maj > 2 || (maj == 2 && min >= 2)) && maj < 4
      assert(got(v) == want, s"version $v")
    }
  }

  test("O2: garbage never passes the gate (and never throws)") {
    val garbage = sample(Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("."), Gen.const("4"),
      Gen.numStr.map(_ + "."), Gen.const("-1.5")), 200)
      .filter(v => !v.matches("\\d+\\.\\d+.*")).distinct
    val got = garbage.toDF("v")
      .select(CaptureOps.supportedVersion($"v")).collect().map(_.getBoolean(0))
    assert(got.forall(_ == false))
  }

  test("O18: rewrite is the inverse of parse on well-formed ids; drops the rest") {
    val wellFormed = for {
      a <- Gen.chooseNum(0L, Long.MaxValue / 2); b <- Gen.chooseNum(0L, 99999L)
    } yield s"job_${a}_$b"
    val ids = sample(Gen.oneOf(wellFormed, Gen.alphaNumStr), 300).distinct
    val got = ids.toDF("j")
      .select($"j", CaptureOps.yarnApplicationId($"j").as("a"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    got.foreach { case (in, out) =>
      if (in.matches("^job_\\d+_\\d+$"))
        assert(out.contains(in.replaceFirst("^job_", "application_")))
      else assert(out.isEmpty, s"malformed $in must map to null")
    }
  }

  test("O9: classifier is total and order-insensitive") {
    val task = for {
      e <- Gen.oneOf("TEZ", "MR", "SPARK", "OTHER")
      llap <- Gen.oneOf(true, false); ddl <- Gen.oneOf(true, false)
    } yield (e, llap, ddl)
    val lists = sample(Gen.chooseNum(0, 4).flatMap(Gen.listOfN(_, task)), 80).distinct
    def classifyAll(ls: Seq[List[(String, Boolean, Boolean)]]): Seq[String] =
      ls.toDF("raw")
        .select(transform($"raw", t => struct(
          t.getField("_1").as("engine"), t.getField("_2").as("llap"),
          t.getField("_3").as("ddl"))).as("tasks"))
        .select(CaptureOps.executionMode($"tasks"))
        .collect().map(_.getString(0)).toSeq
    val modes = classifyAll(lists)
    val valid = Set("NONE", "LLAP", "MR", "TEZ", "SPARK", "DDL", "CLIENT_ONLY")
    assert(modes.forall(valid))
    // permutation invariance: reversing the task list never changes the mode
    val reversed = classifyAll(lists.map(_.reverse))
    modes.zip(reversed).zip(lists).foreach { case ((m1, m2), ts) =>
      assert(m1 == m2, s"order-dependent classification for $ts")
    }
    // empty task list is CLIENT_ONLY
    assert(classifyAll(Seq(Nil)) == Seq("CLIENT_ONLY"))
  }

  test("O19: firstValidJobId picks the first well-formed id, else null") {
    val valid = for {
      a <- Gen.chooseNum(0L, 999999L); b <- Gen.chooseNum(0L, 9999L)
    } yield s"job_${a}_$b"
    val invalid = Gen.oneOf(
      Gen.const("badjob_1"), Gen.alphaStr.map("job_" + _), Gen.const(""),
      Gen.const("job_1_2_3"))
    val lists = sample(
      Gen.chooseNum(0, 5).flatMap(Gen.listOfN(_, Gen.oneOf(valid, invalid))),
      150).distinct
    val got = lists.toDF("ids")
      .select($"ids", CaptureOps.firstValidJobId($"ids").as("f"))
      .collect()
      .map(r => r.getSeq[String](0).toList -> Option(r.getString(1))).toMap
    lists.foreach { ids =>
      val want = ids.find(_.matches("^job_\\d+_\\d+$"))
      assert(got(ids) == want, s"jobIds $ids")
    }
  }
}
