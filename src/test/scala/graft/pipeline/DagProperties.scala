package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks of the scheduler's skip semantics over random
  * layered DAGs. */
object DagProperties extends Properties("Dag") {

  /** Random layered DAG: ids t0..t(n-1); each task depends on a random
    * subset of strictly earlier tasks (acyclic by construction). */
  private val genDagShape: Gen[Seq[(String, Seq[String])]] =
    for {
      n <- Gen.choose(1, 12)
      deps <- Gen.sequence[Seq[Seq[Int]], Seq[Int]]((0 until n).map { i =>
        if (i == 0) Gen.const(Seq.empty[Int])
        else Gen.someOf(0 until i).map(_.toSeq)
      })
    } yield (0 until n).map(i => (s"t$i", deps(i).map(d => s"t$d")))

  private def build(shape: Seq[(String, Seq[String])], log: StringBuilder) =
    new Dag(shape.map { case (id, ds) => Task(id, ds, () => { log.append(id); s"out-$id" }) })

  property("first run executes every task exactly once, in dependency order") =
    Prop.forAll(genDagShape) { shape =>
      val log = new StringBuilder
      val store = new InMemorySignalStore
      val d = build(shape, log)
      val r = d.execute(store)
      val pos = d.order.zipWithIndex.toMap
      r.ran.toSet == shape.map(_._1).toSet &&
        shape.forall { case (id, ds) => ds.forall(dep => pos(dep) < pos(id)) }
    }

  property("unchanged rerun skips everything and runs nothing") =
    Prop.forAll(genDagShape) { shape =>
      val store = new InMemorySignalStore
      build(shape, new StringBuilder).execute(store)
      val log = new StringBuilder
      val r = build(shape, log).execute(store)
      r.ran.isEmpty && r.skipped.size == shape.size && log.isEmpty
    }

  property("a new root task invalidates exactly its descendants' signals or less") =
    Prop.forAll(genDagShape) { shape =>
      val store = new InMemorySignalStore
      build(shape, new StringBuilder).execute(store)
      // change t0's output by changing its run result via externalInput
      val changed = shape.map { case (id, ds) =>
        if (id == "t0") Task(id, ds, () => "CHANGED", externalInput = () => "CHANGED")
        else Task(id, ds, () => s"out-$id")
      }
      val r = new Dag(changed).execute(store)
      // t0 must re-run; every re-run task other than t0 must (transitively)
      // depend on t0
      val depsOf = shape.map { case (id, ds) => id -> ds }.toMap
      def reachesT0(id: String): Boolean =
        id == "t0" || depsOf(id).exists(reachesT0)
      r.ran.contains("t0") && r.ran.forall(reachesT0)
    }
}
