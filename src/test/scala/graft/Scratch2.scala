package graft

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val r = new sources.StatementRunner(spark)
    val dir = "/root/reference/mysql-test/suite/tianmu/std_data"
    Seq(
      """CREATE TABLE AD_PINSTANCE_LOG_DOUBLE_ENCLOSED(ID bigint ,
    AD_CLIENT_ID bigint,
    AD_ORG_ID bigint,
    AD_PINSTANCE_ID bigint,
    P_DATE DATETIME DEFAULT null,
    P_MSG VARCHAR(255),
    OWNERID bigint,
    MODIFIERID bigint,
    CREATIONDATE DATETIME,
    MODIFIEDDATE DATETIME,
    ISACTIVE CHAR(1) DEFAULT 'Y' NOT NULL,
    PRIMARY KEY (ID)) engine=tianmu""",
      s"""load data infile '$dir/issue1263-2.txt' into table AD_PINSTANCE_LOG_DOUBLE_ENCLOSED
FIELDS TERMINATED BY ','
ENCLOSED BY '"'
LINES TERMINATED BY '\\n'
(
@ID,
@AD_CLIENT_ID,
@AD_ORG_ID,
@AD_PINSTANCE_ID,
@P_DATE,
@P_MSG,
@OWNERID,
@MODIFIERID,
@CREATIONDATE,
@MODIFIEDDATE,
@ISACTIVE
)
set
ID=NULLif(@ID,''),
AD_CLIENT_ID=NULLif(@AD_CLIENT_ID,''),
AD_ORG_ID=NULLif(@AD_ORG_ID,''),
AD_PINSTANCE_ID=NULLif(@AD_PINSTANCE_ID,''),
P_DATE=NULLif(@P_DATE,''),
P_MSG=NULLif(@P_MSG,''),
OWNERID=NULLif(@OWNERID,''),
MODIFIERID=NULLif(@MODIFIERID,''),
CREATIONDATE=NULLif(@CREATIONDATE,''),
MODIFIEDDATE=NULLif(@MODIFIEDDATE,''),
ISACTIVE=NULLif(@ISACTIVE,'')""",
      "select * from AD_PINSTANCE_LOG_DOUBLE_ENCLOSED")
    .foreach { sql =>
      System.err.println(">>> " + sql.take(70).replace("\n", " "))
      scala.util.Try { r.run(sql).collect() } match {
        case scala.util.Success(rows) =>
          rows.foreach(row => System.err.println("   " + row.toSeq.mkString("|")))
        case scala.util.Failure(e) =>
          System.err.println("   FAIL: " + e.toString.take(400))
      }
    }
    System.err.println("DONE")
  }
}
