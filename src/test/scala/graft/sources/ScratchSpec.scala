package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The tmpfs scratch root's size guard (r21 verdict item: tmpfs is RAM,
  * so preferring it must be gated on free space, with disk fallback).
  */
class ScratchSpec extends AnyFunSuite {

  test("shmEligible accepts a writable dir with enough usable space") {
    val dir = Files.createTempDirectory("scratch-spec")
    try assert(Scratch.shmEligible(dir, 1L)) // 1 byte of headroom always clears
    finally Files.deleteIfExists(dir)
  }

  test("shmEligible falls back when the byte budget exceeds usable space") {
    val dir = Files.createTempDirectory("scratch-spec")
    // no filesystem has Long.MaxValue usable bytes — the guard must refuse
    try assert(!Scratch.shmEligible(dir, Long.MaxValue))
    finally Files.deleteIfExists(dir)
  }

  test("shmEligible refuses a missing or unwritable path") {
    assert(!Scratch.shmEligible(Paths.get("/nonexistent-scratch-probe"), 1L))
  }

  test("minFreeBytes defaults to 4 GiB absent the env override") {
    if (!sys.env.contains("SPARK_GRAFT_SCRATCH_MIN_FREE_MB"))
      assert(Scratch.minFreeBytes === 4096L * (1L << 20))
  }
}
