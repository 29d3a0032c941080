package graft

import graft.operators.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("targetEncodeLoo: hand-checked leave-one-out means with smoothing") {
    // cats A={10,20}, B={30}; global mu = 20; smoothing m = 2:
    //   (A,10): ((30-10) + 2*20) / ((2-1) + 2) = 60/3 = 20.0
    //   (A,20): ((30-20) + 40) / 3            = 50/3 = 16.6667
    //   (B,30): ((30-30) + 40) / (0 + 2)      = 40/2 = 20.0
    val li = Seq(
      (1L, 1, "A", 10.0), (2L, 1, "A", 20.0), (3L, 1, "B", 30.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val out = Features.targetEncodeLoo(li, smoothing = 2.0, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, "A", 20.0), (2L, "A", 16.6667),
      (3L, "B", 20.0)))
  }

  test("targetEncodeLoo: encoding never leaks the row's own target") {
    // one extreme outlier in its category: its OWN encoding must not
    // move toward the outlier value more than the others' do
    val li = ((1L to 9L).map(i => (i, 1, "A", 10.0)) :+ (10L, 1, "A", 1000.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val out = Features.targetEncodeLoo(li, smoothing = 0.0, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    // LOO for the outlier excludes 1000 → mean of nine 10s = 10
    assert(out(10L) == 10.0)
    // LOO for a normal row includes the outlier → (8*10+1000)/9
    assert(out(1L) == 120.0)
  }
}
