// x16 plan audit: both windows and the final agg should ride ONE exchange
// on l_partkey; the scan should prune to the 3 needed columns.
val df = graft.SparkEntry.queries("x16_grouped_weighted_median")(spark, "/root/testdata/sf0.01")
df.explain("formatted")
System.exit(0)
