package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CommitSlot

/** Nonce-verified commit-slot claims: ownership is re-verifiable, a
  * steal is one atomic rename (two stealers can never both win), and
  * a stalled writer whose claim was stolen must observe the loss
  * instead of releasing (or deleting data under) the usurper's claim.
  * This is the locking primitive under Versioned / ClusterLedger
  * publishes and the index-family compaction. */
class CommitSlotSpec extends AnyFunSuite {

  private def freshClaim(): File = {
    val dir = Files.createTempDirectory("graft_slot").toFile
    new File(dir, "_claim_v00002")
  }

  test("fresh acquire owns; a racing writer refuses; release deletes only when owned") {
    val f = freshClaim()
    val t0 = System.currentTimeMillis()
    val a = CommitSlot.acquire(f, t0).getOrElse(fail("first acquire must win"))
    assert(a.owned())
    // a second writer whose publish started at-or-after the claim's
    // creation sees a FRESH claim (a racer mid-commit) and refuses
    assert(CommitSlot.acquire(f, t0).isEmpty)
    assert(CommitSlot.acquire(f, System.currentTimeMillis()).isEmpty)
    a.release()
    assert(!f.exists() && !a.owned())
  }

  test("a stale claim is stolen; the stalled original observes the loss and never releases the usurper's") {
    val f = freshClaim()
    val a = CommitSlot.acquire(f, System.currentTimeMillis()).get
    assert(a.owned())
    // age the claim into the past: to a retrying writer that started
    // NOW, it predates the whole publish — a crashed attempt's leftover
    assert(f.setLastModified(System.currentTimeMillis() - 3600000L))
    val b = CommitSlot.acquire(f, System.currentTimeMillis())
      .getOrElse(fail("stale claim must be stealable"))
    assert(b.owned())
    // the stalled original detects the steal at its next re-verify —
    // the check Versioned/ClusterLedger run before rmTree/renameTo
    assert(!a.owned())
    // and its release must NOT delete the usurper's claim
    a.release()
    assert(b.owned())
    b.release()
    assert(!f.exists())
  }

  test("N concurrent stealers of one stale claim: at most one ends up owning") {
    val f = freshClaim()
    val a = CommitSlot.acquire(f, System.currentTimeMillis()).get
    assert(f.setLastModified(System.currentTimeMillis() - 3600000L))
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(4)
    val now = System.currentTimeMillis()
    val futures = (1 to 4).map(_ =>
      pool.submit(new java.util.concurrent.Callable[Option[CommitSlot.Claim]] {
        def call() = CommitSlot.acquire(f, now)
      }))
    val claims = futures.flatMap(_.get())
    pool.shutdown()
    // whatever interleaving happened, the end state has EXACTLY one
    // owner among the stealers (the rename is the atomic arbiter; a
    // doubly-stolen claim resolves by the nonce read-back), and the
    // aged original lost
    assert(claims.count(_.owned()) === 1, s"${claims.size} stealers returned claims")
    assert(!a.owned())
    // no graveyard litter outlives the scramble's winners' cleanup
    val leftovers = f.getParentFile.listFiles().map(_.getName)
      .filter(_.contains(".stale."))
    assert(leftovers.isEmpty, leftovers.toSeq)
  }
}
