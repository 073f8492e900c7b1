package graft.queries

import graft.SparkTestBase
import graft.cdc.StateStore

/** Timestamp-based time travel (`maintenance_time_travel_ts`): the
  * wall-clock markers captured between commits must resolve to the
  * version committed BEFORE them (oracle checks the resolved data;
  * here we pin the version mapping itself), and a timestamp before
  * the first surviving commit must refuse, not silently return v0.
  */
class TimeTravelTsSpec extends SparkTestBase {

  test("markers resolve to the commit before them; pre-history refuses") {
    MaintenanceQueries.timeTravelTs(spark, sf).collect()
    val (wh, t1, t2) = MaintenanceQueries.ttTsMarkers(sf)
    val store = new StateStore(wh, 8)
    val target = MaintenanceQueries.TtTsTarget
    assert(store.versionAtTime(target, t1) == 0,
      "marker after wave 1 must resolve to version 0")
    assert(store.versionAtTime(target, t2) == 1,
      "marker after wave 2 must resolve to version 1")
    assert(store.versionAtTime(target, System.currentTimeMillis()) ==
      store.currentVersion(target), "a now-marker resolves to head")
    val ex = intercept[IllegalArgumentException] {
      store.versionAtTime(target, t1 - 3600L * 1000)
    }
    assert(ex.getMessage.contains("no surviving version"))
  }
}
