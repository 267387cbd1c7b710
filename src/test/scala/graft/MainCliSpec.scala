package graft

import org.scalatest.funsuite.AnyFunSuite

/** argparse-parity option parsing for the spark-submit CLI (no Spark
  * session needed — pure parsing). The reference parser is
  * book_converter/cli.py:30-85. */
class MainCliSpec extends AnyFunSuite {

  private def parse(args: String*) = Main.parseOpts(args.toList, Main.xmlFlags)

  test("flag consumes exactly one value; positionals pass through") {
    val (opts, pos) = parse("grouped", "--header-level1", "chapter|episode")
    assert(opts == Map("--header-level1" -> "chapter|episode"))
    assert(pos == List("grouped"))
  }

  test("a recognized flag as the value of another flag errors (argparse parity)") {
    // `xml in out --header-level1 --header-level2 ep` must NOT silently
    // set level1 keywords to the literal "--header-level2"
    val e = intercept[Main.CliError](parse("--header-level1", "--header-level2", "ep"))
    assert(e.msg == "error: argument --header-level1: expected one argument")
  }

  test("flag at end of args errors with 'expected one argument'") {
    val e = intercept[Main.CliError](parse("grouped", "--running-head-threshold"))
    assert(e.msg.contains("--running-head-threshold: expected one argument"))
  }

  test("repeated flag: last occurrence wins") {
    val (opts, _) = parse("--header-level1", "a", "--header-level1", "b")
    assert(opts("--header-level1") == "b")
  }

  test("unknown -- token errors like argparse 'unrecognized arguments'") {
    val e = intercept[Main.CliError](parse("--figure-markers", "x"))
    assert(e.msg == "error: unrecognized arguments: --figure-markers")
  }

  test("negative numbers are valid option values (single dash, argparse parity)") {
    val (opts, _) = parse("--running-head-threshold", "-0.5")
    assert(opts("--running-head-threshold") == "-0.5")
  }

  test("float parsing: argparse type=float semantics") {
    assert(Main.parseFloatArg("--running-head-threshold")("0.75") == 0.75)
    assert(Main.parseFloatArg("--running-head-threshold")("1e-1") == 0.1)
    val e = intercept[Main.CliError](Main.parseFloatArg("--running-head-threshold")("half"))
    assert(e.msg == "error: argument --running-head-threshold: invalid float value: 'half'")
  }

  test("header config: pipe split, strip, empties dropped, None when absent") {
    val cfg = Main.headerConfig(Map("--header-level2" -> " episode |column||")).get
    assert(cfg.level2 == Vector("episode", "column"))
    assert(cfg.level1.isEmpty)
    assert(Main.headerConfig(Map.empty).isEmpty)
  }

  test("--format parses for every mode's flag set") {
    val (opts, pos) = Main.parseOpts(List("64", "8", "--format", "orc"), Set("--format"))
    assert(opts == Map("--format" -> "orc"))
    assert(pos == List("64", "8"))
  }

  test("int parsing: argparse type=int semantics (no raw NumberFormatException)") {
    assert(Main.parseIntArg("buckets")("128") == 128)
    val e = intercept[Main.CliError](Main.parseIntArg("buckets")("/in"))
    assert(e.msg == "error: argument buckets: invalid int value: '/in'")
  }

  test("required positionals: options-before-positionals binds correctly") {
    // argparse accepts `extract --format orc /in /out`
    val (opts, pos0) = Main.parseOpts(List("--format", "orc", "/in", "/out"),
      Set("--format", "--metrics"))
    val (in, out, rest) = Main.twoRequired("extract", "inDir, outDir", pos0)
    assert(opts("--format") == "orc" && in == "/in" && out == "/out" && rest.isEmpty)
    val e = intercept[Main.CliError](Main.twoRequired("extract", "inDir, outDir", List("/in")))
    assert(e.msg == "error: extract: the following arguments are required: inDir, outDir")
  }

  test("--metrics accepts observe/readback, rejects other values") {
    import graft.pipeline.Checkpoint
    assert(Main.metricsMode(Map.empty) == Checkpoint.MetricsObserve)
    assert(Main.metricsMode(Map("--metrics" -> "observe")) == Checkpoint.MetricsObserve)
    assert(Main.metricsMode(Map("--metrics" -> "readback")) == Checkpoint.MetricsReadBack)
    val e = intercept[Main.CliError](Main.metricsMode(Map("--metrics" -> "both")))
    assert(e.msg.contains("invalid choice: 'both'"))
  }
}
