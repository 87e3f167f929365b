-- Engine-side analogue of dags/dev_db_test.sql (reference file:1-3):
-- DDL + DML template executed as one script. TRANSIENT and sysdate()
-- are Snowflake dialect, translated by graft.ops.Sql.translateDialect.
DROP TABLE IF EXISTS graft_dev_test;
CREATE OR REPLACE TRANSIENT TABLE graft_dev_test (name STRING, id INT, load_utc_ts TIMESTAMP) USING parquet;
INSERT INTO graft_dev_test VALUES ('name', 5, sysdate())
