package graft

import org.scalatest.funsuite.AnyFunSuite

class ClusterProfileSpec extends AnyFunSuite {

  test("isLocalMaster: in-process masters are local; everything that " +
    "forks executor JVMs is not (Bench ledger routing depends on this)") {
    assert(ClusterProfile.isLocalMaster("local"))
    assert(ClusterProfile.isLocalMaster("local[4]"))
    assert(ClusterProfile.isLocalMaster("local[32]"))
    assert(ClusterProfile.isLocalMaster("local[*]"))
    assert(ClusterProfile.isLocalMaster("local[2,3]"))
    // real executor JVMs: cluster ledger territory
    assert(!ClusterProfile.isLocalMaster("local-cluster[2,8,4096]"))
    assert(!ClusterProfile.isLocalMaster("spark://host:7077"))
    assert(!ClusterProfile.isLocalMaster("yarn"))
    // unknown/malformed masters classify as non-local: they route to the
    // overwrite-latest cluster ledger, where a misclassification cannot
    // damage the guarded local pin
    assert(!ClusterProfile.isLocalMaster("localhost"))
  }
}
