package graft.tools
import org.apache.spark.sql.SparkSession
object MkSubmitFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("fx")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (pbf, world) = graft.fixtures.OsmWorld.cachedPbf("/tmp/submit-fx", 42L, 4, 200)
    val imgs = graft.tiles.Images.synthesize(spark, 20000, world.clusterCenters, 8)
    graft.tiles.ImageTable.write(imgs, "/tmp/submit-fx/imageTable", snapshotId = 1L)
    println("FIXTURE_READY " + pbf)
    spark.stop()
  }
}
