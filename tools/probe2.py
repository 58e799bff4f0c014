import duckdb
con = duckdb.connect()
d='/root/testdata/sf0.01'
print(con.sql(f"select min(l_shipdate), max(l_shipdate), min(l_quantity) qmin, max(l_quantity) qmax, count(*) filter (where l_quantity != floor(l_quantity)) nonint from '{d}/lineitem.parquet'"))
print(con.sql(f"select min(o_orderdate), max(o_orderdate), min(o_totalprice), max(o_totalprice) from '{d}/orders.parquet'"))
print(con.sql(f"select min(ts), max(ts) from '{d}/events.parquet'"))
print(con.sql(f"select l_discount, count(*) from '{d}/lineitem.parquet' group by 1 order by 1 limit 15"))
print(con.sql(f"select distinct p_type from '{d}/part.parquet' limit 5"))
print(con.sql(f"select distinct o_orderstatus from '{d}/orders.parquet'"))
print(con.sql(f"select distinct o_orderpriority from '{d}/orders.parquet'"))
print(con.sql(f"select count(*) filter (where value != round(value,2)) from '{d}/events.parquet'"))
