package graft.ops

import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Harness-compatibility contract for EVERY catalog query: the driver's
  * correctness gate sorts each result by all columns and hashes the cells,
  * and its pandas compare cannot sort/factorize array, map, or binary
  * cells (round-5's q108 failed the gate exactly this way even though the
  * values were oracle-correct). So no `SparkEntry.queries` output may ship
  * a top-level ArrayType/MapType/BinaryType column — flatten arrays with
  * posexplode (q108), hex-encode binary (q56). This builds every catalog
  * DataFrame at sf0.001 and checks the declared schema only. */
class CatalogSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("no catalog query output has a top-level array/map/binary column") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType == BinaryType =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"driver-gate-incompatible catalog columns:\n  ${offenders.mkString("\n  ")}")
  }

  test("README catalog counts match the actual catalog (docs can't drift)") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val catalogClaim = "the (\\d+)-query operator catalog".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    val oracleClaim = "all (\\d+) queries have oracles".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(catalogClaim.contains(graft.SparkEntry.queries.size),
      s"README query count $catalogClaim != ${graft.SparkEntry.queries.size}")
    assert(oracleClaim.contains(graft.SparkEntry.oracleSql.size),
      s"README oracle count $oracleClaim != ${graft.SparkEntry.oracleSql.size}")
    // every query has an oracle and no oracle is orphaned
    assert(graft.SparkEntry.queries.keySet == graft.SparkEntry.oracleSql.keySet,
      "queries/oracleSql key sets diverge")
  }

  test("every catalog query is classified in SparkEntry.families") {
    // the bench artifact's per-family rollup must never silently dump a
    // new query into "other" — the map is composed from the same
    // per-module registries as `queries`, so the sets must coincide
    assert(graft.SparkEntry.families.keySet == graft.SparkEntry.queries.keySet,
      "families/queries key sets diverge: " +
        (graft.SparkEntry.queries.keySet -- graft.SparkEntry.families.keySet)
          .mkString(","))
  }
}
