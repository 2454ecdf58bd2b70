package graft.queries

/** DuckDB replay of [[graft.operators.LatentFeatures.alsDeterministic]]
  * over the events user×event_type fixture: decimal-exact per-cell
  * rating aggregation, the same md5-lowest user sample, the closed-form
  * quantized item-factor init, and `sweeps` unrolled user/item ridge
  * solves — every Gram sum is an exact BIGINT on both engines and every
  * double expression below is character-for-character the engine's, so
  * factors and fills match bit for bit.
  */
object AlsSql {

  def sql(items: Seq[String], maskItem: String, sampleSize: Int, sweeps: Int): String = {
    val nItems = items.size
    val itemCase = items.zipWithIndex
      .map { case (c, i) => s"WHEN '$c' THEN $i" }.mkString(" ")
    val itemList = items.map(c => s"'$c'").mkString(", ")
    val maskIdx = items.indexOf(maskItem)
    require(maskIdx >= 0, s"mask item $maskItem not in $items")
    val nameRows = items.zipWithIndex
      .map { case (c, i) => s"($i, '$c')" }.mkString(", ")

    val sweepCtes = (1 to sweeps).map { s =>
      val uf =
        s"""uf$s AS (
           |  SELECT u,
           |    CAST(floor(least(greatest((c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12), -50.0), 50.0) * 100000.0 + 0.5) AS BIGINT) AS p1,
           |    CAST(floor(least(greatest((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12), -50.0), 50.0) * 100000.0 + 0.5) AS BIGINT) AS p2
           |  FROM (
           |    SELECT o.u,
           |      CAST(sum(f.q1 * f.q1) AS BIGINT) / 1.0e10 + 0.1 * count(*) AS a11,
           |      CAST(sum(f.q1 * f.q2) AS BIGINT) / 1.0e10 AS a12,
           |      CAST(sum(f.q2 * f.q2) AS BIGINT) / 1.0e10 + 0.1 * count(*) AS a22,
           |      CAST(sum(f.q1 * o.r) AS BIGINT) / 1.0e9 AS c1,
           |      CAST(sum(f.q2 * o.r) AS BIGINT) / 1.0e9 AS c2
           |    FROM obs o JOIN if${s - 1} f USING (it) GROUP BY o.u
           |  )
           |)""".stripMargin
      // LEFT JOIN back to the previous sweep's factors: an item with no
      // observed cell among the sampled users carries its factor forward
      // (mirrors the engine's `itemF ++ solved` rule so sparse fixtures
      // agree instead of diverging into a crash-vs-fewer-rows split)
      val itf =
        s"""if$s AS (
           |  SELECT f0.it, COALESCE(sv.q1, f0.q1) AS q1, COALESCE(sv.q2, f0.q2) AS q2
           |  FROM if${s - 1} f0 LEFT JOIN (
           |  SELECT it,
           |    CAST(floor(least(greatest((c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12), -50.0), 50.0) * 100000.0 + 0.5) AS BIGINT) AS q1,
           |    CAST(floor(least(greatest((a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12), -50.0), 50.0) * 100000.0 + 0.5) AS BIGINT) AS q2
           |  FROM (
           |    SELECT o.it,
           |      CAST(sum(f.p1 * f.p1) AS BIGINT) / 1.0e10 + 0.1 * count(*) AS a11,
           |      CAST(sum(f.p1 * f.p2) AS BIGINT) / 1.0e10 AS a12,
           |      CAST(sum(f.p2 * f.p2) AS BIGINT) / 1.0e10 + 0.1 * count(*) AS a22,
           |      CAST(sum(f.p1 * o.r) AS BIGINT) / 1.0e9 AS c1,
           |      CAST(sum(f.p2 * o.r) AS BIGINT) / 1.0e9 AS c2
           |    FROM obs o JOIN uf$s f USING (u) GROUP BY o.it
           |  )
           |  ) sv USING (it)
           |)""".stripMargin
      s"$uf,\n$itf"
    }.mkString(",\n")

    s"""
WITH cells AS (
  SELECT user_id AS u,
         CAST(CASE event_type $itemCase END AS INT) AS it,
         CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) * 10000.0 + 0.5) AS BIGINT) AS r
  FROM events
  WHERE event_type IN ($itemList)
  GROUP BY user_id, event_type
  HAVING count(value) > 0
),
masked AS (
  SELECT * FROM cells WHERE NOT (u % 5 = 0 AND it = $maskIdx)
),
susers AS (
  SELECT u FROM (
    SELECT u, ('0x' || substr(md5(u::VARCHAR), 1, 15))::BIGINT AS hh
    FROM (SELECT DISTINCT u FROM masked)
  ) ORDER BY hh, u LIMIT $sampleSize
),
obs AS (SELECT m.* FROM masked m JOIN susers USING (u)),
if0 AS (
  SELECT CAST(i AS INT) AS it,
         CAST(floor((1.0 + 0.1 * i) * 100000.0 + 0.5) AS BIGINT) AS q1,
         CAST(floor(((i * 7) % 5 - 2) * 0.2 * 100000.0 + 0.5) AS BIGINT) AS q2
  FROM range(0, $nItems) t(i)
),
$sweepCtes,
nm(it, attribute) AS (VALUES $nameRows)
SELECT s.u AS user_id, nm.attribute,
  COALESCE(o.r / 10000.0,
           floor(((uf$sweeps.p1 * if$sweeps.q1 + uf$sweeps.p2 * if$sweeps.q2) / 1.0e10) * 10000.0 + 0.5) / 10000.0) AS filled
FROM susers s
CROSS JOIN nm
JOIN uf$sweeps ON uf$sweeps.u = s.u
JOIN if$sweeps ON if$sweeps.it = nm.it
LEFT JOIN obs o ON o.u = s.u AND o.it = nm.it"""
  }
}
