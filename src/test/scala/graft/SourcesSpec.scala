package graft

import graft.sources.Tables

/** Source-wiring pins (SURVEY §2.1 S1): the JDBC option map is the
  * contract Spark's JDBC source reads by exact key — a typo in
  * "partitionColumn"/"lowerBound"/... silently degrades to a single-task
  * unpartitioned scan, which at 100 TB is a dead pipeline — plus an
  * EXECUTED end-to-end JDBC read against embedded Derby (the one JDBC
  * engine in /opt/spark/jars), standing in for the reference's
  * PostgreSQL source in this zero-egress sandbox. */
class SourcesSpec extends SparkSuite {

  test("jdbc option wiring: exact keys + stringified bounds") {
    val got = Tables.jdbcOptions(
      url = "jdbc:postgresql://db:5432/posttop",
      table = "(SELECT v.id FROM video v) AS src",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000000L,
      numPartitions = 64)
    assert(got == Map(
      "url" -> "jdbc:postgresql://db:5432/posttop",
      "dbtable" -> "(SELECT v.id FROM video v) AS src",
      "partitionColumn" -> "id",
      "lowerBound" -> "0",
      "upperBound" -> "1000000",
      "numPartitions" -> "64"))
  }

  test("S1 executed: partitioned JDBC scan + pushed 3-way join on embedded Derby") {
    // Derby would otherwise drop derby.log into the repo working dir
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // the reference's 4-table shape (src/data/database.py:27-39):
      // video_metadata ⋈ ner_result (video_id AND language) ⋈ video ⋈ channel
      st.execute("CREATE TABLE video (id INT PRIMARY KEY, " +
        "yt_id VARCHAR(16), channel_id INT)")
      st.execute("CREATE TABLE channel (id INT PRIMARY KEY, name VARCHAR(64))")
      st.execute("CREATE TABLE video_metadata (video_id INT, " +
        "language VARCHAR(8), title VARCHAR(128), description VARCHAR(256))")
      st.execute("CREATE TABLE ner_result (video_id INT, " +
        "language VARCHAR(8), ner_result VARCHAR(256))")
      st.execute("INSERT INTO channel VALUES (1, 'GraftChannel'), (2, 'OtherChannel')")
      val ins = conn.prepareStatement(
        "INSERT INTO video VALUES (?, ?, ?)")
      val insMeta = conn.prepareStatement(
        "INSERT INTO video_metadata VALUES (?, ?, ?, ?)")
      val insNer = conn.prepareStatement(
        "INSERT INTO ner_result VALUES (?, ?, ?)")
      (1 to 20).foreach { i =>
        ins.setInt(1, i); ins.setString(2, f"yt$i%04d")
        ins.setInt(3, 1 + i % 2); ins.executeUpdate()
        insMeta.setInt(1, i); insMeta.setString(2, "en")
        insMeta.setString(3, s"Senbonzakura cover $i")
        insMeta.setString(4, s"sung by Miku $i"); insMeta.executeUpdate()
        insNer.setInt(1, i)
        // language-mismatched NER rows for odd ids: the AND-language join
        // predicate must exclude them (the reference's composite key)
        insNer.setString(2, if (i % 2 == 1) "hu" else "en")
        insNer.setString(3, s"""[[0,12,"title","Senbonzakura","TITLE"]]""")
        insNer.executeUpdate()
      }
      // the join pushed to the source via `dbtable` subquery, exactly the
      // production shape readJdbc documents; vid is the numeric partition key
      val src =
        """(SELECT v.yt_id, nr.language, vm.title, vm.description,
                   nr.ner_result, c.name AS channel_name, v.id AS vid
           FROM video_metadata vm
           INNER JOIN ner_result nr ON nr.video_id = vm.video_id
             AND nr.language = vm.language
           INNER JOIN video v ON vm.video_id = v.id
           INNER JOIN channel c ON c.id = v.channel_id) src"""
      val df = Tables.readJdbc(spark, url, src,
        partitionColumn = "vid", lowerBound = 1L, upperBound = 21L,
        numPartitions = 4)
      // partitioned read: 4 concurrent range scans, not one task
      assert(df.rdd.getNumPartitions == 4)
      val rows = df.collect()
      // Derby folds unquoted identifiers to UPPERCASE - Row.getAs is
      // case-sensitive (Spark column RESOLUTION below is not)
      // only even ids survive the composite-key join (language matches)
      assert(rows.length == 10)
      assert(rows.map(_.getAs[Int]("VID")).sorted.toSeq ==
        (2 to 20 by 2).toSeq)
      assert(rows.forall(_.getAs[String]("LANGUAGE") == "en"))
      val r2 = rows.find(_.getAs[Int]("VID") == 2).get
      assert(r2.getAs[String]("YT_ID") == "yt0002")
      assert(r2.getAs[String]("CHANNEL_NAME") == "GraftChannel")
      assert(r2.getAs[String]("TITLE") == "Senbonzakura cover 2")
      // filter pushdown reaches the JDBC source (no full-table transfer)
      val pushed = df.where(org.apache.spark.sql.functions.col("vid") === 4)
      assert(pushed.count() == 1)
    } finally {
      conn.close()
      // drop the in-memory DB so reruns in the same JVM start clean
      try java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:graftdb;drop=true")
      catch { case _: java.sql.SQLException => () } // drop always "fails"
    }
  }
}
