package graft

import org.scalatest.funsuite.AnyFunSuite

/** The trigger engine against the reference's own goldens
  * (mysql-test/suite/tianmu/r/trigger.result, issue1318/issue1185's
  * engine gate). Tables declare engine=tianmu and the session sets
  * tianmu_no_key_error=ON — the reference's own enabling flag for
  * triggers on tianmu tables (sql_trigger.cc:229-235). */
class TriggerSpec extends AnyFunSuite {
  private def spark = TestSession.spark

  private def runner(flagOn: Boolean = true) = {
    val r = new sources.StatementRunner(
      sources.MtrParity.statementSession(spark))
    if (flagOn) r.run("SET SESSION tianmu_no_key_error=ON")
    r
  }

  private def one(r: sources.StatementRunner, sql: String): Any =
    r.run(sql).collect()(0).get(0)

  test("engine gate: CREATE TRIGGER on tianmu is 3240 without " +
      "tianmu_no_key_error (issue1185), allowed with it (issue1318), " +
      "and allowed on innodb either way (issue1186)") {
    val r = runner(flagOn = false)
    r.run("create table tg1 (i int) engine=tianmu")
    val e = intercept[Exception](r.run(
      "create trigger trg before insert on tg1 for each row set @a:=1"))
    assert(e.getMessage.contains("3240"))
    r.run("create table tg2 (i int) engine=innodb")
    r.run("create trigger trg2 before insert on tg2 for each row set @a:=1")
    r.run("SET SESSION tianmu_no_key_error=ON")
    r.run("create trigger trg before insert on tg1 for each row set @a:=1")
    r.run("drop table tg1")
    r.run("drop table tg2")
  }

  test("BEFORE INSERT accumulates @sum = 1852.48 " +
      "(trigger.result:11-16)") {
    val r = runner()
    r.run("CREATE TABLE account (acct_num INT, amount DECIMAL(10,2))engine=tianmu")
    r.run("CREATE TRIGGER ins_sum BEFORE INSERT ON account FOR EACH ROW SET @sum = @sum + NEW.amount")
    r.run("SET @sum = 0")
    r.run("INSERT INTO account VALUES(137,14.98),(141,1937.50),(97,-100.00)")
    assert(one(r, "SELECT @sum AS 'Total amount inserted'").toString
      == "1852.48")
    r.run("DROP TRIGGER test.ins_sum")
    r.run("drop table account")
  }

  test("simple before/after triggers, @a reads NEW, after-insert " +
      "concat (trigger.result:18-60: @a=1, @a=123, @a='2:3:4:5')") {
    val r = runner()
    r.run("create table t1 (i int)engine=tianmu")
    r.run("create trigger trg before insert on t1 for each row set @a:=1")
    r.run("set @a:=0")
    assert(one(r, "select @a").toString == "0")
    r.run("insert into t1 values (1)")
    assert(one(r, "select @a").toString == "1")
    r.run("drop trigger trg")
    r.run("create trigger trg before insert on t1 for each row set @a:=new.i")
    r.run("insert into t1 values (123)")
    assert(one(r, "select @a").toString == "123")
    r.run("drop trigger trg")
    r.run("drop table t1")
    r.run("create table t1 (i int not null primary key)engine=tianmu")
    r.run("""create trigger trg after insert on t1 for each row
      set @a:= if(@a,concat(@a, ":", new.i), new.i)""")
    r.run("set @a:=''")
    r.run("insert into t1 values (2),(3),(4),(5)")
    assert(one(r, "select @a") == "2:3:4:5")
    r.run("drop trigger trg")
    r.run("drop table t1")
  }

  test("several triggers: before-insert clamps new.j, before/after " +
      "update chain (trigger.result:62-92)") {
    val r = runner()
    r.run("create table t1 (i int, j int)engine=tianmu")
    r.run("""create trigger trg1 before insert on t1 for each row
      begin
        if new.j > 10 then
          set new.j := 10;
        end if;
      end""")
    r.run("""create trigger trg2 before update on t1 for each row
      begin
        if old.i % 2 = 0 then
          set new.j := -1;
        end if;
      end""")
    r.run("""create trigger trg3 after update on t1 for each row
      begin
        if new.j = -1 then
          set @fired:= "Yes";
        end if;
      end""")
    r.run("set @fired:=''")
    r.run("insert into t1 values (1,2),(2,3),(3,14)")
    assert(one(r, "select @fired") == "")
    val rows1 = r.run("select * from t1 order by i").collect()
      .map(x => (x.get(0), x.get(1))).toList
    assert(rows1 == List((1, 2), (2, 3), (3, 10)))
    r.run("update t1 set j= 20")
    assert(one(r, "select @fired") == "Yes")
    val rows2 = r.run("select * from t1 order by i").collect()
      .map(x => (x.get(0), x.get(1))).toList
    assert(rows2 == List((1, 20), (2, -1), (3, 20)))
    r.run("drop trigger trg1"); r.run("drop trigger trg2")
    r.run("drop trigger trg3"); r.run("drop table t1")
  }

  test("INSERT IGNORE / ON DUPLICATE KEY UPDATE @log interleave " +
      "(trigger.result:120-152)") {
    val r = runner()
    r.run("create table t1 (id int not null primary key, data int)engine=tianmu")
    r.run("""create trigger t1_bi before insert on t1 for each row
      set @log:= concat(@log, "(BEFORE_INSERT: new=(id=", new.id, ", data=", new.data,"))")""")
    r.run("""create trigger t1_ai after insert on t1 for each row
      set @log:= concat(@log, "(AFTER_INSERT: new=(id=", new.id, ", data=", new.data,"))")""")
    r.run("""create trigger t1_bu before update on t1 for each row
      set @log:= concat(@log, "(BEFORE_UPDATE: old=(id=", old.id, ", data=", old.data,
                                            ") new=(id=", new.id, ", data=", new.data,"))")""")
    r.run("""create trigger t1_au after update on t1 for each row
      set @log:= concat(@log, "(AFTER_UPDATE: old=(id=", old.id, ", data=", old.data,
                                           ") new=(id=", new.id, ", data=", new.data,"))")""")
    r.run("set @log:= ''")
    r.run("insert into t1 values (1, 1)")
    assert(one(r, "select @log") ==
      "(BEFORE_INSERT: new=(id=1, data=1))(AFTER_INSERT: new=(id=1, data=1))")
    r.run("set @log:= ''")
    r.run("insert ignore t1 values (1, 2)")
    assert(one(r, "select @log") == "(BEFORE_INSERT: new=(id=1, data=2))")
    r.run("set @log:= ''")
    r.run("insert into t1 (id, data) values (1, 3), (2, 2) on duplicate key update data= data + 1")
    assert(one(r, "select @log") ==
      "(BEFORE_INSERT: new=(id=1, data=3))" +
        "(BEFORE_UPDATE: old=(id=1, data=1) new=(id=1, data=2))" +
        "(AFTER_UPDATE: old=(id=1, data=1) new=(id=1, data=2))" +
        "(BEFORE_INSERT: new=(id=2, data=2))" +
        "(AFTER_INSERT: new=(id=2, data=2))")
    r.run("drop table t1")
  }

  test("triggers accessing other tables + statement rollback on " +
      "ER_BAD_NULL_ERROR (trigger.result:168-205: t1 keeps only 1,2; " +
      "t2 keeps only their events)") {
    val r = runner()
    r.run("create table t1 (id int primary key, data varchar(10), fk int)engine=tianmu")
    r.run("create table t2 (event varchar(100))engine=tianmu")
    r.run("create table t3 (id int primary key)engine=tianmu")
    r.run("""create trigger t1_ai after insert on t1 for each row
      insert into t2 values (concat("INSERT INTO t1 id=", new.id, " data='", new.data, "'"))""")
    r.run("""insert into t1 (id, data) values (1, "one"), (2, "two")""")
    assert(one(r, "select count(*) from t2").toString == "2")
    r.run("drop trigger t1_ai")
    r.run("""create trigger t1_bi before insert on t1 for each row
      begin
        if exists (select id from t3 where id=new.fk) then
          insert into t2 values (concat("INSERT INTO t1 id=", new.id, " data='", new.data, "' fk=", new.fk));
        else
          insert into t2 values (concat("INSERT INTO t1 FAILED id=", new.id, " data='", new.data, "' fk=", new.fk));
          set new.id= NULL;
        end if;
      end""")
    r.run("insert into t3 values (1)")
    val e = intercept[Exception](r.run(
      """insert into t1 values (4, "four", 1), (5, "five", 2)"""))
    assert(e.getMessage.contains("1048") ||
      e.getMessage.toLowerCase.contains("cannot be null"))
    // statement atomicity: neither the target rows nor the trigger's
    // side-effect rows survive (trigger.result golden)
    assert(r.run("select id from t1 order by id").collect()
      .map(_.get(0)).toList == List(1, 2))
    assert(one(r, "select count(*) from t2").toString == "2")
    r.run("drop table t1"); r.run("drop table t2"); r.run("drop table t3")
  }

  test("trigger invoking a stored function; default-setting trigger " +
      "(trigger.result:207-240)") {
    val r = runner()
    r.run("create table t1 (id int primary key, data varchar(10))engine=tianmu")
    r.run("create table t2 (seq int)engine=tianmu")
    r.run("insert into t2 values (10)")
    r.run("create function f1 () returns int return (select max(seq) from t2)")
    r.run("""create trigger t1_bi before insert on t1 for each row
      begin
        if new.id > f1() then
          set new.id:= f1();
        end if;
      end""")
    r.run("""insert into t1 values (1, "first")""")
    r.run("""insert into t1 values (f1(), "max")""")
    assert(r.run("select id from t1 order by id").collect()
      .map(_.get(0)).toList == List(1, 10))
    r.run("drop table t1"); r.run("drop table t2")
    r.run("drop function f1")
    // complex default values
    r.run("create table t1 (i int not null, j int)engine=tianmu")
    r.run("""create trigger trg before insert on t1 for each row
      begin
        if isnull(new.j) then
          set new.j:= new.i * 10;
        end if;
      end""")
    r.run("insert into t1 (i) values (1)")
    r.run("insert into t1 (i,j) values (2, 3)")
    assert(r.run("select * from t1 order by i").collect()
      .map(x => (x.get(0), x.get(1))).toList == List((1, 10), (2, 3)))
    r.run("drop trigger trg"); r.run("drop table t1")
  }

  test("creation-error ladder: 1363/1362/1054/1146/1359/1360/1347/" +
      "1361/1435 (trigger.test:240-300)") {
    val r = runner()
    r.run("create table t1 (i int)engine=tianmu")
    r.run("create table t3 (i int)engine=tianmu")
    def expectErr(sql: String, code: String): Unit = {
      val e = intercept[Exception](r.run(sql))
      assert(e.getMessage.contains(code), s"$sql → ${e.getMessage}")
    }
    expectErr("create trigger trg before insert on t1 for each row set @a:= old.i", "1363")
    expectErr("create trigger trg before delete on t1 for each row set @a:= new.i", "1363")
    expectErr("create trigger trg before update on t1 for each row set old.i:=1", "1362")
    expectErr("create trigger trg before delete on t1 for each row set new.i:=1", "1363")
    expectErr("create trigger trg after update on t1 for each row set new.i:=1", "1362")
    expectErr("create trigger trg before update on t1 for each row set new.j:=1", "1054")
    expectErr("create trigger trg before update on t1 for each row set @a:=old.j", "1054")
    expectErr("create trigger trg before insert on t2 for each row set @a:=1", "1146")
    r.run("create trigger trg before insert on t1 for each row set @a:=1")
    expectErr("create trigger trg after insert on t1 for each row set @a:=1", "1359")
    expectErr("create trigger trg before insert on t3 for each row set @a:=1", "1359")
    r.run("create trigger trg2 before insert on t3 for each row set @a:=1")
    r.run("drop trigger trg2")
    r.run("drop trigger trg")
    expectErr("drop trigger trg", "1360")
    r.run("create view v1 as select * from t1")
    expectErr("create trigger trg before insert on v1 for each row set @a:=1", "1347")
    r.run("drop view v1")
    r.run("drop table t1")
    r.run("drop table t3")
    r.run("create temporary table t1 (i int)engine=tianmu")
    expectErr("create trigger trg before insert on t1 for each row set @a:=1", "1361")
    r.run("drop table t1")
  }

  test("string-literal trigger, DROP TABLE drops triggers, RENAME " +
      "keeps them (trigger.result:302-330, 445-460)") {
    val r = runner()
    r.run("create table t1 (x1col char)engine=tianmu")
    r.run("create trigger tx1 before insert on t1 for each row set new.x1col = 'x'")
    r.run("insert into t1 values ('y')")
    assert(one(r, "select * from t1") == "x")
    r.run("drop trigger tx1")
    r.run("drop table t1")
    r.run("create table t1 (a int)engine=tianmu")
    r.run("create trigger trg1 before insert on t1 for each row set new.a= 10")
    r.run("drop table t1")
    r.run("create table t1 (a int)engine=tianmu")
    r.run("insert into t1 values ()")
    assert(r.run("select * from t1").collect()(0).isNullAt(0))
    r.run("drop table t1")
    // rename keeps triggers
    r.run("create table t1 (id int)engine=tianmu")
    r.run("create trigger t1_bi before insert on t1 for each row set @a:=new.id")
    r.run("create trigger t1_ai after insert on test.t1 for each row set @b:=new.id")
    r.run("insert into t1 values (101)")
    assert(one(r, "select @a").toString == "101")
    assert(one(r, "select @b").toString == "101")
    val info = r.run("""select trigger_schema, trigger_name, event_object_schema,
           event_object_table, action_statement from information_schema.triggers
           where event_object_schema = 'test'""").collect()
    assert(info.length == 2)
    r.run("rename table t1 to t2")
    r.run("insert into t2 values (102)")
    assert(one(r, "select @a").toString == "102")
    r.run("drop trigger t1_bi")
    r.run("drop trigger t1_ai")
    r.run("drop table t2")
  }

  test("NEW.x as OUT/INOUT procedure parameter " +
      "(trigger.result:505-520: 11 → p1 sets 5 → p2 ×7 → 35)") {
    val r = runner()
    r.run("CREATE TABLE t1 (i1 INT)engine=tianmu")
    r.run("INSERT INTO t1 VALUES (3)")
    r.run("CREATE PROCEDURE p1(OUT i1 INT) DETERMINISTIC NO SQL SET i1 = 5")
    r.run("CREATE PROCEDURE p2(INOUT i1 INT) DETERMINISTIC NO SQL SET i1 = i1 * 7")
    r.run("""CREATE TRIGGER t1_bu BEFORE UPDATE ON t1 FOR EACH ROW
      BEGIN
        CALL p1(NEW.i1);
        CALL p2(NEW.i1);
      END""")
    r.run("UPDATE t1 SET i1 = 11 WHERE i1 = 3")
    assert(one(r, "select * from t1").toString == "35")
    r.run("DROP TRIGGER t1_bu")
    r.run("DROP PROCEDURE p2"); r.run("DROP PROCEDURE p1")
    r.run("drop table t1")
  }

  test("multi-table UPDATE/DELETE fire triggers per processed row " +
      "(trigger.result:330-360 and the bug569/570/571 goldens)") {
    val r = runner()
    r.run("create table t1 (i int, j int default 10, k int not null)engine=tianmu")
    r.run("create table t2 (i int)engine=tianmu")
    r.run("insert into t1 (i, k) values (1, 1)")
    r.run("insert into t2 values (1)")
    r.run("create trigger trg1 before update on t1 for each row set @a:= @a + new.j - old.j")
    r.run("create trigger trg2 after update on t1 for each row set @b:= 'Fired'")
    r.run("set @a:= 0, @b:= ''")
    r.run("update t1, t2 set j = j + 10 where t1.i = t2.i")
    assert(one(r, "select @a").toString == "10")
    assert(one(r, "select @b") == "Fired")
    r.run("create trigger trg3 before delete on t1 for each row set @c:= @c + old.j")
    r.run("create trigger trg4 before delete on t2 for each row set @d:= @d + old.i")
    r.run("create trigger trg5 after delete on t1 for each row set @e:= 'After delete t1 fired'")
    r.run("create trigger trg6 after delete on t2 for each row set @f:= 'After delete t2 fired'")
    r.run("set @c:= 0, @d:= 0, @e:= '', @f:= ''")
    r.run("delete t1, t2 from t1, t2 where t1.i = t2.i")
    assert(one(r, "select @c").toString == "20")
    assert(one(r, "select @d").toString == "1")
    assert(one(r, "select @e") == "After delete t1 fired")
    assert(one(r, "select @f") == "After delete t2 fired")
    r.run("drop table t1"); r.run("drop table t2")
    // after-update fires per matched row even when values are unchanged
    r.run("create table t1 (a int)engine=tianmu")
    r.run("create trigger trg1 after update on t1 for each row set @a= @a+1")
    r.run("insert into t1 values (1), (2), (3)")
    r.run("set @a= 0")
    r.run("update t1 set a= a")
    assert(one(r, "select @a").toString == "3")
    r.run("drop trigger trg1")
    r.run("drop table t1")
    // bug570: before delete sums old values under a WHERE
    r.run("create table t2 (i int)engine=tianmu")
    r.run("insert into t2 values (1),(2),(3),(4)")
    r.run("create trigger trg before delete on t2 for each row set @del_sum:= @del_sum + old.i")
    r.run("set @del_sum:= 0")
    r.run("delete from t2 where i <= 3")
    assert(one(r, "select @del_sum").toString == "6")
    assert(one(r, "select count(*) from t2").toString == "1")
    r.run("drop trigger trg")
    r.run("drop table t2")
  }

  test("UPDATE IGNORE with PK collision: update skipped, after " +
      "trigger not fired (trigger.result UPDATE IGNORE section)") {
    val r = runner()
    r.run("CREATE TABLE t1 (a INT PRIMARY KEY)engine=tianmu")
    r.run("CREATE TABLE t2 (after_update CHAR(50))engine=tianmu")
    r.run("CREATE TABLE t3 (b INT PRIMARY KEY)engine=tianmu")
    r.run("INSERT INTO t1 VALUES (1), (2)")
    r.run("INSERT INTO t3 VALUES (1)")
    r.run("""CREATE TRIGGER post_update_t1 AFTER UPDATE ON t1
      FOR EACH ROW BEGIN
        INSERT INTO t2 VALUES('POST UPDATE TRIGGER FOR UPDATE IGNORE ON t1 FIRED');
      END""")
    r.run("UPDATE IGNORE t1 SET a=2 WHERE a=1")
    assert(one(r, "select count(*) from t2").toString == "0")
    r.run("UPDATE IGNORE t1,t3 SET t1.a=2 WHERE t1.a=1")
    assert(one(r, "select count(*) from t2").toString == "0")
    assert(r.run("select a from t1 order by a").collect()
      .map(_.get(0)).toList == List(1, 2))
    r.run("DROP TRIGGER post_update_t1")
    r.run("DROP TABLE t1"); r.run("DROP TABLE t2"); r.run("DROP TABLE t3")
  }

  test("TRUNCATE fires no delete triggers (trigger.result: " +
      "Handler_delete 0, COUNT(*)=0)") {
    val r = runner()
    r.run("CREATE TABLE t1 (a INT PRIMARY KEY)engine=tianmu")
    r.run("CREATE TABLE t2 (a INT PRIMARY KEY)engine=tianmu")
    r.run("INSERT INTO t1 VALUES (1),(2),(3),(4),(5),(6),(7),(8)")
    r.run("""CREATE TRIGGER trg_t1 BEFORE DELETE on t1 FOR EACH ROW
      INSERT INTO t2 VALUES (OLD.a)""")
    r.run("TRUNCATE t1")
    assert(one(r, "SELECT COUNT(*) FROM t2").toString == "0")
    r.run("DROP TRIGGER trg_t1")
    r.run("DROP TABLE t1"); r.run("DROP TABLE t2")
  }

  test("INSERT…SELECT fires both triggers per row; trigger mutation " +
      "does not leak across rows (trigger.result:371-395)") {
    val r = runner()
    r.run("create table t1 (i int, j int default 10)engine=tianmu")
    r.run("create table t2 (i int)engine=tianmu")
    r.run("insert into t2 values (1), (2)")
    r.run("""create trigger trg1 before insert on t1 for each row
      begin
        if new.i = 1 then
          set new.j := 1;
        end if;
      end""")
    r.run("create trigger trg2 after insert on t1 for each row set @a:= 1")
    r.run("set @a:= 0")
    r.run("insert into t1 (i) select * from t2")
    assert(r.run("select * from t1 order by i").collect()
      .map(x => (x.get(0), x.get(1))).toList == List((1, 1), (2, 10)))
    assert(one(r, "select @a").toString == "1")
    r.run("drop table t1"); r.run("drop table t2")
  }

  test("REPLACE forms run the before-insert trigger " +
      "(trigger.result scenarios 1.3/1.4)") {
    val r = runner()
    r.run("CREATE TABLE t1 (a INT DEFAULT 7, b INT)engine=tianmu")
    r.run("CREATE TRIGGER trg BEFORE INSERT ON t1 FOR EACH ROW SET @x:= NEW.a")
    r.run("SET @x = 0")
    r.run("REPLACE INTO t1() VALUES()")
    assert(one(r, "select @x").toString == "7")
    r.run("SET @x = 0")
    r.run("REPLACE INTO t1(b) SELECT 1")
    assert(one(r, "select @x").toString == "7")
    r.run("DROP TABLE t1")
  }

  test("trigger cascade: delete triggers invoking deletes on other " +
      "tables (bug580 golden)") {
    val r = runner()
    r.run("create table t1 (id int primary key, fk_t2 int)engine=tianmu")
    r.run("create table t2 (id int primary key, fk_t3 int)engine=tianmu")
    r.run("create table t3 (id int primary key)engine=tianmu")
    r.run("insert into t1 values (1,1), (2,1), (3,2)")
    r.run("insert into t2 values (1,1), (2,2)")
    r.run("insert into t3 values (1), (2)")
    r.run("""create trigger t3_ad after delete on t3 for each row
      delete from t2 where fk_t3=old.id""")
    r.run("""create trigger t2_ad after delete on t2 for each row
      delete from t1 where fk_t2=old.id""")
    r.run("delete from t3 where id = 1")
    assert(one(r, "select count(*) from t3").toString == "1")
    assert(r.run("select id from t2").collect().map(_.get(0)).toList
      == List(2))
    assert(r.run("select id from t1 order by id").collect()
      .map(_.get(0)).toList == List(3))
    r.run("drop table t1"); r.run("drop table t2"); r.run("drop table t3")
  }
}
