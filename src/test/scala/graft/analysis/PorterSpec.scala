package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from M.F. Porter, "An algorithm for suffix stripping" (1980) —
  * the published example pairs for each step. */
class PorterSpec extends AnyFunSuite {
  val goldens = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress",
    "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile", "analogousli" -> "analog",
    "vietnamization" -> "vietnam", "predication" -> "predic",
    "operator" -> "oper", "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("Porter goldens from the 1980 paper") {
    val bad = goldens.collect {
      case (in, want) if Porter.stem(in) != want =>
        s"$in -> ${Porter.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"mis-stemmed: ${bad.mkString(", ")}")
  }
}
