package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PorterSpec extends AnyFunSuite {

  // Step examples from the published algorithm (Porter 1980) traced to
  // full-pipeline outputs, plus the corpus vocabulary this engine indexes.
  val pairs: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+cleanup)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // steps 2-5
    "relational" -> "relat", "rational" -> "ration",
    "generalization" -> "gener", "oscillators" -> "oscil",
    // corpus vocabulary (oracle CASE in TextQueries mirrors these)
    "merge" -> "merg", "table" -> "tabl", "query" -> "queri",
    "customer" -> "custom", "key" -> "kei", "value" -> "valu",
    "merges" -> "merg", "joining" -> "join", "window" -> "window",
    "spark" -> "spark", "batch" -> "batch", "line" -> "line")

  test("stems match published Porter outputs") {
    for ((in, want) <- pairs)
      assert(Porter.stem(in) == want, s"stem($in) = ${Porter.stem(in)}, want $want")
  }

  test("short words pass through") {
    for (w <- Seq("", "a", "ab", "go", "is"))
      assert(Porter.stem(w) == w)
  }
}
