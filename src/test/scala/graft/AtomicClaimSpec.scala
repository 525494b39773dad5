package graft

import java.nio.file.{FileAlreadyExistsException, Files}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.sources.AtomicClaim
import org.scalatest.funsuite.AnyFunSuite

/** The optimistic-concurrency primitive under the Delta/Hudi/Iceberg
  * writers: racing publishers of the same version file — exactly one may
  * win, the winner's content must be what readers see, and losers must
  * keep their staging file for the retry path. (The previous
  * stat-then-rename implementation let two racers both "win", silently
  * losing one commit — caught by DeltaSpec's racing-appenders test as a
  * rare flake.) */
class AtomicClaimSpec extends AnyFunSuite {

  test("N racing publishers of one target: exactly one wins, content intact") {
    val dir = Files.createTempDirectory("graft_claim")
    val target = dir.resolve("00000000000000000001.json")
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results =
      try {
        val futures = (0 until n).map { i =>
          pool.submit(new java.util.concurrent.Callable[(Int, Boolean, Boolean)] {
            def call(): (Int, Boolean, Boolean) = {
              val tmp = dir.resolve(s".tmp-$i")
              Files.write(tmp, s"writer-$i".getBytes)
              start.await()
              try { AtomicClaim.publish(tmp, target); (i, true, !Files.exists(tmp)) }
              catch {
                case _: FileAlreadyExistsException => (i, false, Files.exists(tmp))
              }
            }
          })
        }
        start.countDown()
        futures.map(_.get(30, TimeUnit.SECONDS))
      } finally pool.shutdown()

    val winners = results.filter(_._2)
    assert(winners.size == 1, s"exactly one racer must claim the version, got: $results")
    // winner's staging file is consumed; every loser keeps its staging
    // file for the caller's cleanup/retry path
    assert(results.forall(_._3), s"staging-file contract violated: $results")
    // the surviving content is the winner's, complete
    val content = new String(Files.readAllBytes(target))
    assert(content == s"writer-${winners.head._1}")
  }

  test("sequential claims: second publisher of the same version is refused") {
    val dir = Files.createTempDirectory("graft_claim2")
    val target = dir.resolve("v1.metadata.json")
    val t1 = dir.resolve(".tmp-a"); Files.write(t1, "first".getBytes)
    val t2 = dir.resolve(".tmp-b"); Files.write(t2, "second".getBytes)
    AtomicClaim.publish(t1, target)
    intercept[FileAlreadyExistsException] { AtomicClaim.publish(t2, target) }
    assert(new String(Files.readAllBytes(target)) == "first")
    assert(Files.exists(t2), "loser keeps its staging file")
  }
}
