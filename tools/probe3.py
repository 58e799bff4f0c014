import duckdb
con = duckdb.connect()
d='/root/testdata/sf0.01'
print(con.sql(f"select event_type, count(*) from '{d}/events.parquet' group by 1 order by 1"))
print(con.sql(f"select p_name, p_brand from '{d}/part.parquet' limit 5"))
print(con.sql(f"select count(*) from '{d}/part.parquet'"))
print(con.sql(f"select c_mktsegment, count(*) from '{d}/customer.parquet' group by 1"))
