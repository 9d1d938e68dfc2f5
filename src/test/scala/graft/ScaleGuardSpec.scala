package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ScaleSuite pre-flight dial guard — the structural fix for the r16
  * refresh mistake, where a factor-52 decade started at a 300 s dial whose
  * 600 s build budget was under m_triangle_state's last-known ~757 s wall
  * at that factor, guaranteeing the build timeout and its cascade into the
  * four triangle-state consumer rows. The guard reads the PRIOR committed
  * ledger for the factor (both numbers it needs are already in it) and
  * refuses to start instead.
  */
class ScaleGuardSpec extends AnyFunSuite {

  /** Minimal ledger with the fields the guard parses, shaped exactly like
    * ScaleSuite's emitted JSON (the regexes anchor on the materialization
    * row's field order).
    */
  private def ledger(dial: Long, timeouts: Seq[String],
      buildWall: Double, buildStatus: String): String = {
    val tl = timeouts.map("\"" + _ + "\"").mkString(",")
    s"""{"metric":"scale_suite","factor":52,"timeout_sec":$dial,""" +
      s""""scaled_timeout":[$tl],""" +
      s""""materializations":{"m_triangle_state":{"base":24.4,""" +
      s""""scaled":$buildWall,"x":null,"base_status":"ok",""" +
      s""""scaled_status":"$buildStatus","base_shuffle":1,""" +
      s""""scaled_shuffle":2,"x_shuffle":null}},"queries":{}}"""
  }

  test("refuses a dial whose 2x build budget is under the prior ledger's " +
      "largest ok build wall") {
    val prior = ledger(600, Seq.empty, 757.2, "ok")
    val r = ScaleSuite.timeoutGuard(prior, 300)
    assert(r.isDefined && r.get.contains("build budget"), r)
    // 2*378 = 756 < 757.2 still refuses; 2*379 fits
    assert(ScaleSuite.timeoutGuard(prior, 378).isDefined)
    assert(ScaleSuite.timeoutGuard(prior, 379).isEmpty)
  }

  test("refuses re-running at a dial <= one that already produced scaled " +
      "timeouts (same dial, same outcome)") {
    // the r16 artifact's shape: dial 300, build timed out (not ok, so it
    // contributes no known wall), four consumer rows timed out
    val prior = ledger(300, Seq("q_triangles", "q_ktruss"), 600.45,
      "timeout")
    val at300 = ScaleSuite.timeoutGuard(prior, 300)
    assert(at300.isDefined && at300.get.contains("prior ledger recorded"),
      at300)
    assert(ScaleSuite.timeoutGuard(prior, 200).isDefined)
    // a RAISED dial is exactly the prescribed fix — must pass
    assert(ScaleSuite.timeoutGuard(prior, 600).isEmpty)
  }

  test("a clean prior ledger (no timeouts, builds fit) passes, and a " +
      "timed-out build's wall is not mistaken for a known wall") {
    assert(ScaleSuite.timeoutGuard(ledger(600, Seq.empty, 500.0, "ok"),
      600).isEmpty)
    // build status timeout: its 'scaled' is the watchdog cutoff, not a
    // measurement — only rule (b) may fire, and with no scaled_timeout
    // rows and a raised dial nothing does
    assert(ScaleSuite.timeoutGuard(ledger(300, Seq.empty, 600.45,
      "timeout"), 301).isEmpty)
  }

  test("ScaleGraph.priorScaled reads scaled walls + shuffle bytes from a " +
      "ledger, skipping query-timeout rows and non-ok build rows") {
    val l =
      """{"metric":"scale_suite","timeout_sec":300,""" +
      """"scaled_timeout":["q_triangles"],""" +
      """"materializations":{""" +
      """"m_ok":{"base":1.0,"scaled":103.2,"x":15.8,"base_status":"ok",""" +
      """"scaled_status":"ok","base_shuffle":7,"scaled_shuffle":88,""" +
      """"x_shuffle":1.1},""" +
      """"m_bad":{"base":24.4,"scaled":600.4,"x":null,""" +
      """"base_status":"ok","scaled_status":"timeout","base_shuffle":1,""" +
      """"scaled_shuffle":2,"x_shuffle":null}},""" +
      """"queries":{""" +
      """"q_ok":{"base":0.5,"scaled":9.8,"x":19.6,"base_pre":0.5,""" +
      """"base_timed":0.6,"scaled_pre":9.9,"scaled_timed":9.8,""" +
      """"base_shuffle":10,"scaled_shuffle":207,"x_shuffle":20.7},""" +
      """"q_triangles":{"base":1.0,"scaled":300.1,"x":null,""" +
      """"base_pre":1.0,"base_timed":1.0,"scaled_pre":null,""" +
      """"scaled_timed":null,"base_shuffle":3,"scaled_shuffle":0,""" +
      """"x_shuffle":null}}}"""
    val p = ScaleGraph.priorScaled(l)
    assert(p == Map("m_ok" -> ((103.2, 88L)), "q_ok" -> ((9.8, 207L))), p)
  }

  test("ledgerName maps decade factors onto effective-SF names") {
    assert(ScaleSuite.ledgerName(10) == "BENCH_SF1.json")
    assert(ScaleSuite.ledgerName(52) == "BENCH_SFx52.json")
    assert(ScaleSuite.ledgerName(104) == "BENCH_SFx104.json")
  }

  test("the guard parses the actual emitted-ledger field order (committed " +
      "artifact shape)") {
    // regression pin against regex drift: the real f52 ledger in the repo
    // root (the first decade with a priced-materializations section) must
    // parse — a dial above both its own and the build-budget bound passes,
    // a dial of 1 s cannot fit any real build and refuses
    val f52 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_SFx52.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val maxOk = """"scaled":([0-9.]+),"x":[^,]*,"base_status":"[a-z]+","scaled_status":"ok"""".r
      .findAllMatchIn(f52).map(_.group(1).toDouble).foldLeft(0.0)(math.max)
    assert(maxOk > 0.0, "guard regex no longer matches the emitted ledger")
    assert(ScaleSuite.timeoutGuard(f52,
      math.ceil(maxOk / 2).toLong + 601).isEmpty)
    assert(ScaleSuite.timeoutGuard(f52, 1).isDefined)
  }
}
