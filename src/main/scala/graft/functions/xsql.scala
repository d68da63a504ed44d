package graft.functions

/** Cross-dialect SQL fragment builders.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * running "equivalent ANSI SQL". For scalar math that is easy; for the
  * text/dedup operators (shingles, MinHash, SimHash, rolling hashes) the
  * expressions are deep enough that maintaining two hand-written copies WILL
  * drift. So every such expression is built once, against this tiny dialect
  * interface, and rendered twice: the Spark rendering is wrapped in
  * `expr(...)` inside the DataFrame pipeline, the DuckDB rendering is pasted
  * into the oracle SQL. All arithmetic is integer (mod 1e9+7) or
  * sequential-fold double, so the two engines agree bit-for-bit.
  *
  * Only functions whose names/semantics differ between the engines appear
  * here; everything identical (CASE, CAST, arithmetic, comparison) is written
  * inline by callers.
  */
sealed abstract class Dialect {
  /** regex split; must keep trailing empty strings (both engines do) */
  def splitWs(s: String): String
  /** split into single characters */
  def splitChars(s: String): String
  def split(s: String, sep: String): String
  def transform(arr: String, v: String, body: String): String
  def filterArr(arr: String, v: String, body: String): String
  /** left fold with explicit BIGINT/DOUBLE init — sequential, same order both engines */
  def fold(arr: String, init: String, acc: String, v: String, body: String): String
  /** left fold whose ACCUMULATOR is an array (DuckDB's list_reduce can't
    * mix an array init into a scalar list, so elements are wrapped as
    * single-element arrays first). CONTRACT: inside `body`, the lambda
    * variable `v` is bound to a SINGLE-ELEMENT ARRAY holding the current
    * element — read it with elementAt(v, 1), or append it whole with
    * concatArr(acc, v). */
  def foldArr(arr: String, init: String, acc: String, v: String, body: String): String
  def arrayMin(a: String): String
  def arrayDistinct(a: String): String
  def arrayIntersect(a: String, b: String): String
  /** distinct union */
  def arrayUnion(a: String, b: String): String
  def arraySort(a: String): String
  def size(a: String): String
  /** 1-based slice of n elements */
  def slice(arr: String, start1: String, n: String): String
  /** inclusive integer sequence */
  def seq(a: String, b: String): String
  def arrayJoin(arr: String, sep: String): String
  /** 1-based element access */
  def elementAt(arr: String, idx1: String): String
  def intDiv(a: String, b: String): String
  def xor(a: String, b: String): String
  def bitCount(a: String): String
  def strToDouble(s: String): String
  def castString(e: String): String
  /** seconds since epoch of a timestamp */
  def epochSeconds(ts: String): String
  /** truncate timestamp to day, result typed TIMESTAMP in both engines */
  def dayTrunc(ts: String): String
  /** ts + n hours (n integer expression) */
  def addHours(ts: String, n: String): String
  /** extract JSON field as string, path like '$.k' */
  def jsonGet(js: String, path: String): String
  /** 1-based index of literal `sub` in `s`, 0 when absent */
  def strIndex(s: String, sub: String): String
  /** true when the regex matches anywhere in `s` */
  def regexMatch(s: String, pattern: String): String
  def regexpCount(s: String, pattern: String): String
  /** replace ALL regex matches (DuckDB needs the 'g' flag — its default
    * replaces only the first match, Spark's replaces all) */
  def regexReplaceAll(s: String, pattern: String, repl: String): String
  /** capture group `group` of the FIRST regex match ('' when no match —
    * both engines' regexp_extract contract) */
  def regexExtract(s: String, pattern: String, group: Int): String
  /** cast array<float> to array<double> */
  def castDoubleArray(a: String): String
  /** array literal from pre-escaped single-quoted string items */
  def arrayLit(items: Seq[String]): String
  /** single-element array holding an arbitrary EXPRESSION (arrayLit only
    * takes literals) */
  def arrayOf(e: String): String
  /** concatenation of two array expressions */
  def concatArr(a: String, b: String): String
  /** full English weekday name of a timestamp, e.g. 'Wednesday'
    * (reference strftime('%A'), check_hours_availability.py:44) */
  def dayName(ts: String): String
  /** 12-hour clock string of a timestamp, e.g. '02:30 PM'
    * (reference strftime('%I:%M %p'), check_hours_availability.py:45) */
  def time12(ts: String): String
}

object SparkDialect extends Dialect {
  def splitWs(s: String) = s"split($s, '\\\\s+')"
  def splitChars(s: String) = s"split($s, '')"
  def split(s: String, sep: String) = s"split($s, '$sep')"
  def transform(arr: String, v: String, body: String) = s"transform($arr, $v -> $body)"
  def filterArr(arr: String, v: String, body: String) = s"filter($arr, $v -> $body)"
  def fold(arr: String, init: String, acc: String, v: String, body: String) =
    s"aggregate($arr, $init, ($acc, $v) -> $body)"
  def foldArr(arr: String, init: String, acc: String, v: String, body: String) =
    s"aggregate(transform($arr, __e -> array(__e)), $init, ($acc, $v) -> $body)"
  def arrayMin(a: String) = s"array_min($a)"
  def arrayDistinct(a: String) = s"array_distinct($a)"
  def arrayIntersect(a: String, b: String) = s"array_intersect($a, $b)"
  def arrayUnion(a: String, b: String) = s"array_union($a, $b)"
  def arraySort(a: String) = s"array_sort($a)"
  def size(a: String) = s"size($a)"
  def slice(arr: String, start1: String, n: String) = s"slice($arr, $start1, $n)"
  def seq(a: String, b: String) = s"sequence($a, $b)"
  def arrayJoin(arr: String, sep: String) = s"array_join($arr, '$sep')"
  def elementAt(arr: String, idx1: String) = s"element_at($arr, $idx1)"
  def intDiv(a: String, b: String) = s"($a div $b)"
  def xor(a: String, b: String) = s"($a ^ $b)"
  def bitCount(a: String) = s"bit_count($a)"
  def strToDouble(s: String) = s"CAST($s AS DOUBLE)"
  def castString(e: String) = s"CAST($e AS STRING)"
  def epochSeconds(ts: String) = s"unix_timestamp($ts)"
  def dayTrunc(ts: String) = s"date_trunc('day', $ts)"
  def addHours(ts: String, n: String) = s"($ts + make_interval(0, 0, 0, 0, $n, 0, 0))"
  def jsonGet(js: String, path: String) = s"get_json_object($js, '$path')"
  def strIndex(s: String, sub: String) = s"instr($s, '$sub')"
  def regexMatch(s: String, pattern: String) =
    s"($s RLIKE '${pattern.replace("\\", "\\\\")}')"
  // Spark SQL string literals process backslash escapes; regexes are passed
  // in canonical (single-backslash) form and doubled here.
  def regexpCount(s: String, pattern: String) =
    s"regexp_count($s, '${pattern.replace("\\", "\\\\")}')"
  def regexReplaceAll(s: String, pattern: String, repl: String) =
    s"regexp_replace($s, '${pattern.replace("\\", "\\\\")}', '$repl')"
  def regexExtract(s: String, pattern: String, group: Int) =
    s"regexp_extract($s, '${pattern.replace("\\", "\\\\")}', $group)"
  def castDoubleArray(a: String) = s"CAST($a AS ARRAY<DOUBLE>)"
  def arrayLit(items: Seq[String]) =
    // Nil must render an EMPTY array — mkString's bookends would produce
    // array(''), a 1-element array holding the empty string
    if (items.isEmpty) "array()"
    else items.mkString("array('", "', '", "')")
  def arrayOf(e: String) = s"array($e)"
  def concatArr(a: String, b: String) = s"concat($a, $b)"
  def dayName(ts: String) = s"date_format($ts, 'EEEE')"
  def time12(ts: String) = s"date_format($ts, 'hh:mm a')"
}

object DuckDialect extends Dialect {
  def splitWs(s: String) = s"string_split_regex($s, '\\s+')"
  def splitChars(s: String) = s"string_split($s, '')"
  def split(s: String, sep: String) = s"string_split($s, '$sep')"
  def transform(arr: String, v: String, body: String) = s"list_transform($arr, $v -> $body)"
  def filterArr(arr: String, v: String, body: String) = s"list_filter($arr, $v -> $body)"
  def fold(arr: String, init: String, acc: String, v: String, body: String) =
    s"list_reduce(list_prepend($init, $arr), ($acc, $v) -> $body)"
  def foldArr(arr: String, init: String, acc: String, v: String, body: String) =
    s"list_reduce(list_prepend($init, list_transform($arr, __e -> [__e])), " +
      s"($acc, $v) -> $body)"
  def arrayMin(a: String) = s"list_min($a)"
  def arrayDistinct(a: String) = s"list_distinct($a)"
  def arrayIntersect(a: String, b: String) = s"list_intersect($a, $b)"
  def arrayUnion(a: String, b: String) = s"list_distinct(list_concat($a, $b))"
  def arraySort(a: String) = s"list_sort($a)"
  def size(a: String) = s"len($a)"
  def slice(arr: String, start1: String, n: String) =
    s"($arr)[$start1:($start1) + ($n) - 1]"
  def seq(a: String, b: String) = s"generate_series($a, $b)"
  def arrayJoin(arr: String, sep: String) = s"array_to_string($arr, '$sep')"
  def elementAt(arr: String, idx1: String) = s"($arr)[$idx1]"
  def intDiv(a: String, b: String) = s"($a // $b)"
  def xor(a: String, b: String) = s"xor($a, $b)"
  def bitCount(a: String) = s"bit_count(CAST($a AS BIGINT))"
  def strToDouble(s: String) = s"CAST($s AS DOUBLE)"
  def castString(e: String) = s"CAST($e AS VARCHAR)"
  // floor, not CAST: DuckDB CAST(DOUBLE AS BIGINT) rounds-to-nearest while
  // Spark's unix_timestamp truncates sub-second parts
  def epochSeconds(ts: String) = s"CAST(floor(epoch($ts)) AS BIGINT)"
  def dayTrunc(ts: String) = s"CAST(date_trunc('day', $ts) AS TIMESTAMP)"
  def addHours(ts: String, n: String) = s"($ts + to_hours(CAST($n AS BIGINT)))"
  def jsonGet(js: String, path: String) = s"json_extract_string($js, '$path')"
  def strIndex(s: String, sub: String) = s"strpos($s, '$sub')"
  def regexMatch(s: String, pattern: String) = s"regexp_matches($s, '$pattern')"
  def regexpCount(s: String, pattern: String) = s"len(regexp_extract_all($s, '$pattern'))"
  def regexReplaceAll(s: String, pattern: String, repl: String) =
    s"regexp_replace($s, '$pattern', '$repl', 'g')"
  def regexExtract(s: String, pattern: String, group: Int) =
    s"regexp_extract($s, '$pattern', $group)"
  def castDoubleArray(a: String) = s"CAST($a AS DOUBLE[])"
  def arrayLit(items: Seq[String]) =
    if (items.isEmpty) "[]" else items.mkString("['", "', '", "']")
  def arrayOf(e: String) = s"[$e]"
  def concatArr(a: String, b: String) = s"list_concat($a, $b)"
  def dayName(ts: String) = s"strftime($ts, '%A')"
  def time12(ts: String) = s"strftime($ts, '%I:%M %p')"
}
