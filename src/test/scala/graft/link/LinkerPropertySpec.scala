package graft.link

import graft.model.Span
import org.scalacheck.{Gen, Prop, Properties}
import scala.util.Random

/** Property-based invariants for the linker (SURVEY §5 new-engine test plan):
  * stronger than the reference, which silently depends on input order (M2). */
object LinkerPropertySpec extends Properties("DependencyLinker") {

  private val services = Vector("a-svc", "b-svc", "c-svc", "d-svc", "e-svc")
  private val kinds = Vector(Some("CLIENT"), Some("SERVER"), Some("PRODUCER"),
    Some("CONSUMER"), None)

  /** Random trace forest: spans with random parent pointers into earlier spans
    * (plus dangling/absent parents), random kinds/endpoints/errors/dupes. */
  private val genTrace: Gen[List[Span]] = for {
    n <- Gen.choose(0, 25)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val id = f"$i%016x"
      val parent =
        if (i == 0 || rnd.nextInt(10) == 0) None
        else if (rnd.nextInt(10) == 0) Some("feeddeadbeef0000") // dangling
        else Some(f"${rnd.nextInt(i)}%016x")
      Span(
        traceId = "0000000000000abc",
        parentId = parent,
        id = id,
        kind = kinds(rnd.nextInt(kinds.size)),
        timestamp = if (rnd.nextBoolean()) Some(1000L + i) else None,
        duration = None,
        shared = rnd.nextInt(4) == 0,
        localServiceName = if (rnd.nextInt(8) == 0) None else Some(services(rnd.nextInt(services.size))),
        remoteServiceName = if (rnd.nextInt(3) == 0) None else Some(services(rnd.nextInt(services.size))),
        errorTag = rnd.nextInt(5) == 0
      )
    }.toList
  }

  property("errorCount <= callCount and counts positive") = Prop.forAll(genTrace) { spans =>
    DependencyLinker.link(spans).forall(l =>
      l.callCount >= 1 && l.errorCount >= 0 && l.errorCount <= l.callCount)
  }

  property("output independent of input order") = Prop.forAll(genTrace) { spans =>
    val expect = DependencyLinker.link(spans)
    val shuffled = new Random(42).shuffle(spans)
    DependencyLinker.link(shuffled) == expect
  }

  property("link endpoints come from input service names") = Prop.forAll(genTrace) { spans =>
    val names = spans.flatMap(s => s.localServiceName ++ s.remoteServiceName).toSet
    DependencyLinker.link(spans).forall(l => names(l.parent) && names(l.child))
  }

  property("(parent, child) keys are distinct") = Prop.forAll(genTrace) { spans =>
    val out = DependencyLinker.link(spans)
    out.map(l => (l.parent, l.child)).distinct.size == out.size
  }

  property("total calls bounded by span-report count") = Prop.forAll(genTrace) { spans =>
    // merge can only shrink; each merged span emits at most 2 links (its own +
    // one client backfill)
    DependencyLinker.link(spans).map(_.callCount).sum <= 2L * spans.size
  }

  property("low64 idempotent and width-unifying") = Prop.forAll(Gen.listOfN(32, Gen.hexChar)) { cs =>
    val id128 = cs.mkString.toLowerCase
    val low = Span.low64(id128)
    low.length == 16 && Span.low64(low) == low
  }
}
