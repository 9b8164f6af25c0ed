package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Wire-level fuzz of the CQL v4 transport: arbitrary rows — unicode
  * service names, embedded quotes/whitespace/control chars, every null
  * pattern, token extremes — serialized by the scripted server and decoded
  * by the client must round-trip exactly, across random page sizes (the
  * paging continuation must never drop or duplicate a row). */
class CqlTransportPropertySpec extends Properties("cqlTransport") {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.const("with space"),
    Gen.const("quo\"te'aps"),
    Gen.const("丸山テスト"),
    Gen.const("ctrl"),
    Gen.const("pipe|colon:slash/"))

  private val genOptStr: Gen[String] = Gen.oneOf(genStr, Gen.const(null))

  private val genRow: Gen[FRow] = for {
    token <- Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.oneOf(Long.MinValue, -1L, 0L, 1L, Long.MaxValue))
    traceId <- genStr.suchThat(_ != null)
    parentId <- genOptStr
    kind <- genOptStr
    ts <- Gen.oneOf(Gen.const(null.asInstanceOf[java.lang.Long]),
      Gen.chooseNum(0L, Long.MaxValue).map(java.lang.Long.valueOf))
    dur <- Gen.oneOf(Gen.const(null.asInstanceOf[java.lang.Long]),
      Gen.chooseNum(0L, 1000000L).map(java.lang.Long.valueOf))
    shared <- Gen.oneOf(null.asInstanceOf[java.lang.Boolean],
      java.lang.Boolean.TRUE, java.lang.Boolean.FALSE)
    lEp <- genOptStr
    rEp <- genOptStr
    tags <- Gen.oneOf(
      Gen.const(null.asInstanceOf[Map[String, String]]),
      Gen.const(Map.empty[String, String]),
      Gen.mapOfN(2, Gen.zip(genStr.suchThat(_ != null), genStr.suchThat(_ != null))))
    id <- genStr.suchThat(_ != null)
  } yield FRow(token, traceId, parentId, id, kind, ts, dur, shared, lEp, rEp, tags)

  property("rows round-trip the wire exactly, for any page size") =
    Prop.forAll(Gen.listOfN(7, genRow), Gen.choose(1, 9)) { (rows, pageSize) =>
      // distinct ids so order-insensitive comparison is well-defined
      val distinct = rows.zipWithIndex.map { case (r, i) => r.copy(id = s"id$i-${r.id}") }
      val server = new ScriptedCassandra(distinct)
      try {
        val client = new CqlClient("127.0.0.1", server.port)
        try {
          val got = client.queryAll("SELECT * FROM zipkin2.span", pageSize)
            .map { case (cols, vals) => C3SpanRow.fromRow(cols, vals) }.toList
          val expect = distinct.map { r =>
            C3SpanRow(Option(r.traceId), Option(r.parentId), Option(r.id),
              Option(r.kind), Option(r.ts).map(_.longValue),
              Option(r.duration).map(_.longValue),
              Option(r.shared).map(_.booleanValue),
              Option(r.lEp), Option(r.rEp), Option(r.tags))
          }
          got.sortBy(_.id) == expect.sortBy(_.id)
        } finally client.close()
      } finally server.stop()
    }
}
