package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{BooleanType, StringType}

/** Executable commands for the reference's DDL statements, so its job
  * scripts run VERBATIM through `spark.sql` without a lakehouse catalog:
  *
  *  - `CREATE NAMESPACE IF NOT EXISTS iceberg.bronze`
  *    (`/root/reference/jobs/merge_orders_silver.py:25-27`,
  *    `ingest_orders_raw.py:22` with catalog `demo`)
  *  - `CREATE TABLE IF NOT EXISTS demo.bronze.orders_cdc_raw (…) USING
  *    iceberg` (`ingest_orders_raw.py:24-34`,
  *    `merge_orders_silver.py:30-47`)
  *  - `CREATE VIEW iceberg.silver.orders_current_priv AS …` /
  *    `DROP VIEW IF EXISTS …` (`README.md:105-116`)
  *  - `SHOW SCHEMAS FROM iceberg` / `SHOW TABLES FROM iceberg.bronze`
  *    (`README.md:200-201`)
  *
  * [[GraftSqlParser]] swaps the parsed plans for these commands when the
  * statement names one of the reference's catalogs (`iceberg`, `demo`) —
  * Spark's own session-catalog DDL is untouched otherwise. Each command
  * is a driver-side metadata operation on the session's shared
  * [[TableStore]] state; nothing here touches executors, so the 100-TB
  * story is the metastore's, not this code's.
  */
private[catalog] object GraftCatalogs {
  /** The reference's two catalog spellings for the SAME catalog
    * (`ingest_orders_raw.py:4` CATALOG="demo";
    * `merge_orders_silver.py:9` CATALOG="iceberg"). */
  def isGraft(name: String): Boolean =
    name.equalsIgnoreCase("iceberg") || name.equalsIgnoreCase("demo")
}

case class GraftCreateNamespaceCommand(ns: String, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    if (!ifNotExists && store.listNamespaces().contains(ns))
      throw new IllegalStateException(s"namespace already exists: $ns")
    store.createNamespace(ns)
    Seq.empty
  }
}

case class GraftCreateTableCommand(ns: String, name: String,
                                   tableSchema: org.apache.spark.sql.types.StructType,
                                   ignoreIfExists: Boolean,
                                   partitioning: Seq[String] = Seq.empty)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    if (!ignoreIfExists && store.tableExists(ns, name))
      throw new IllegalStateException(s"table already exists: $ns.$name")
    // PARTITIONED BY columns must exist in the declared schema
    partitioning.foreach { p =>
      graft.pipeline.Snapshot.parseSpecField(p).sources.foreach { src =>
        if (!tableSchema.fieldNames.exists(_.equalsIgnoreCase(src)))
          throw new IllegalArgumentException(
            s"PARTITIONED BY references unknown column: $src " +
              s"(columns: ${tableSchema.fieldNames.mkString(", ")})")
      }
    }
    store.createTableIfNotExists(ns, name, tableSchema)
    if (partitioning.nonEmpty)
      store.setPendingPartitionSpec(ns, name, partitioning)
    Seq.empty
  }
}

/** CREATE [OR REPLACE] VIEW — the query plan stays unresolved until run
  * (same contract as [[GraftMergeCommand]]), then resolves through the
  * session's full analyzer, so the view body may reference other
  * registered tables by qualified name. */
case class GraftCreateViewCommand(ns: String, name: String,
                                  query: LogicalPlan,
                                  allowExisting: Boolean, replace: Boolean,
                                  originalText: Option[String] = None)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val exists = store.tableExists(ns, name)
    if (exists && allowExisting && !replace) return Seq.empty
    if (exists && !allowExisting && !replace)
      throw new IllegalStateException(s"view already exists: $ns.$name")
    // validate now (analysis errors surface at CREATE VIEW, like any
    // engine), but store the UNRESOLVED plan: the view re-binds to the
    // base tables' current state at every read (Trino-view semantics).
    // The statement's query text rides along so an attached persistent
    // catalog can re-create the view in a later session.
    store.createLateBoundView(ns, name, query,
      PlanBridge.ofRows(spark, query), sqlText = originalText)
    Seq.empty
  }
}

/** `CREATE [OR REPLACE] TABLE <t> [AS <query>]` with a source query —
  * CTAS, the other table-creation shape Iceberg supports beside the
  * declared-schema form ([[GraftCreateTableCommand]]). The query stays
  * unresolved until run (same contract as [[GraftCreateViewCommand]]),
  * then materializes eagerly — a CTAS result is a TABLE, a snapshot of
  * the query's output at creation time, not a view. */
case class GraftCtasCommand(ns: String, name: String, query: LogicalPlan,
                            ignoreIfExists: Boolean, replace: Boolean,
                            orCreate: Boolean = true)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    if (store.tableExists(ns, name) && !replace) {
      if (ignoreIfExists) return Seq.empty
      throw new IllegalStateException(s"table already exists: $ns.$name")
    }
    if (replace && !orCreate && !store.tableExists(ns, name))
      throw new java.util.NoSuchElementException(
        s"REPLACE TABLE target does not exist: $ns.$name")
    if (store.isView(ns, name))
      throw new UnsupportedOperationException(
        s"$ns.$name is a view; CREATE OR REPLACE TABLE cannot replace it")
    // materialize now: CTAS commits data, it does not store a query
    store.register(ns, name,
      PlanBridge.ofRows(spark, query).localCheckpoint())
    Seq.empty
  }
}

/** `DROP TABLE [IF EXISTS] <t>` — removes the registration (or
  * snapshot-backed entry); views are rejected (DROP VIEW is the
  * statement for that). */
case class GraftDropTableCommand(ns: String, name: String,
                                 ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = new TableStore(spark).dropTable(ns, name)
    if (!dropped && !ifExists)
      throw new java.util.NoSuchElementException(s"no such table: $ns.$name")
    Seq.empty
  }
}

case class GraftDropViewCommand(ns: String, name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = new TableStore(spark).dropView(ns, name)
    if (!dropped && !ifExists)
      throw new java.util.NoSuchElementException(s"no such view: $ns.$name")
    Seq.empty
  }
}

/** ALTER TABLE … ADD COLUMNS — Iceberg-style schema evolution (the
  * reference stores every table as Iceberg,
  * `/root/reference/docker-compose.yml`, whose headline capability this
  * is): metadata-only, existing rows read NULL in the added columns, no
  * data rewrite — the registered plan just gains a projection. */
case class GraftAddColumnsCommand(ns: String, name: String,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).alterTable(ns, name, df =>
      cols.foldLeft(df) { case (acc, (c, t)) =>
        if (acc.columns.exists(_.equalsIgnoreCase(c)))
          throw new IllegalArgumentException(
            s"column already exists: $c in $ns.$name")
        acc.withColumn(c, org.apache.spark.sql.functions.lit(null).cast(t))
      })
    Seq.empty
  }
}

/** ALTER TABLE … DROP COLUMN [IF EXISTS] — projection-only, no rewrite. */
case class GraftDropColumnsCommand(ns: String, name: String,
    cols: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).alterTable(ns, name, df =>
      cols.foldLeft(df) { (acc, c) =>
        acc.columns.find(_.equalsIgnoreCase(c)) match {
          case Some(real) =>
            if (acc.columns.length == 1)
              throw new IllegalStateException(
                s"cannot drop the last column of $ns.$name")
            acc.drop(real)
          case None if ifExists => acc
          case None => throw new IllegalArgumentException(
            s"no such column: $c in $ns.$name")
        }
      })
    Seq.empty
  }
}

/** ALTER TABLE … RENAME COLUMN — carries the data (Iceberg renames by
  * field id; here the projection re-aliases), rejects collisions. */
case class GraftRenameColumnCommand(ns: String, name: String,
    from: String, to: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).alterTable(ns, name, df => {
      val real = df.columns.find(_.equalsIgnoreCase(from)).getOrElse(
        throw new IllegalArgumentException(
          s"no such column: $from in $ns.$name"))
      if (df.columns.exists(_.equalsIgnoreCase(to)))
        throw new IllegalArgumentException(
          s"column already exists: $to in $ns.$name")
      df.withColumnRenamed(real, to)
    })
    Seq.empty
  }
}

/** ALTER TABLE … ALTER COLUMN <c> TYPE <t> — Iceberg's type-evolution
  * contract verbatim: only SAFE widening promotions are allowed
  * (every stored value keeps its exact meaning; readers of old data
  * need no rewrite), everything else is rejected loudly. Iceberg's
  * list (int→long, float→double, decimal precision growth at the same
  * scale) plus the smaller Spark integrals widening among themselves.
  * Projection-only like ADD/DROP/RENAME — the registered plan gains an
  * in-place cast, no data rewrite. */
case class GraftAlterColumnTypeCommand(ns: String, name: String,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {

  private def widens(from: org.apache.spark.sql.types.DataType,
                     to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (f, t) if f == t => true // no-op, like Iceberg
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d2.scale == d1.scale && d2.precision >= d1.precision
      case _ => false
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).alterTable(ns, name, df =>
      cols.foldLeft(df) { case (acc, (c, to)) =>
        val real = acc.columns.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"no such column: $c in $ns.$name"))
        val from = acc.schema(real).dataType
        if (!widens(from, to))
          throw new UnsupportedOperationException(
            s"ALTER COLUMN $real TYPE: only widening promotions are " +
              s"allowed (TINYINT/SMALLINT/INT→BIGINT, FLOAT→DOUBLE, " +
              s"DECIMAL precision growth at the same scale); cannot " +
              s"change ${from.simpleString} to ${to.simpleString}")
        acc.withColumn(real, acc(real).cast(to))
      })
    Seq.empty
  }
}

/** DESCRIBE TABLE for graft registrations (incl. snapshot-backed
  * tables) — Spark's native output shape (col_name, data_type,
  * comment). */
case class GraftDescribeTableCommand(ns: String, name: String,
                                     extended: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val snapPath = store.snapshotPath(ns, name)
    // Snapshot.read, not a raw scan: the logical schema (hidden
    // partitioning's derived fields dropped)
    val df = snapPath
      .map(p => graft.pipeline.Snapshot.read(spark, p))
      .getOrElse(store.table(ns, name))
    val schemaRows = df.schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString,
        f.getComment().orNull))
    if (!extended) schemaRows
    else {
      // Spark's EXTENDED tail: a separator then the detail section
      val props = store.properties(ns, name)
      schemaRows ++ Seq(
        Row("", "", null),
        Row("# Detailed Table Information", "", null),
        Row("Namespace", ns, null),
        Row("Table", name, null),
        Row("Type",
          if (store.isView(ns, name)) "VIEW" else "MANAGED", null),
        Row("Provider", "graft", null)) ++
        // ANALYZE stats, Spark's own "N bytes, M rows" shape
        GraftStats.describeRows(props) ++
        snapPath.map(p => Row("Location", p, null)).toSeq ++
        // snapshot-backed extras: version + the r10 evolution metadata
        // (partition spec / write sort order), shown only when set —
        // the introspection twin of ADD PARTITION FIELD and WRITE
        // ORDERED BY
        snapPath.toSeq.flatMap { p =>
          graft.pipeline.Snapshot.currentVersion(p)
            .map(v => Row("Current Version", v.toString, null)).toSeq ++
            (graft.pipeline.Snapshot.partitionSpec(p) match {
              case Seq() => Nil
              case spec => Seq(Row("Partition Spec",
                spec.mkString("[", ", ", "]"), null))
            }) ++
            (graft.pipeline.Snapshot.sortOrder(p) match {
              case Seq() => Nil
              case ord => Seq(Row("Write Order", ord.map { case (c, asc) =>
                s"$c ${if (asc) "ASC" else "DESC"}" }
                .mkString("[", ", ", "]"), null))
            }) ++
            // the storage-partitioned-join layout, when stamped
            (graft.pipeline.Snapshot.bucketLayout(p) match {
              case Some((n, cols)) => Seq(Row("Bucket Layout",
                s"$n buckets on ${cols.mkString(", ")} (murmur3)", null))
              case None => Nil
            })
        } ++
        (props.get(GraftIdentifierFieldsCommand.Key) match {
          case Some(f) => Seq(Row("Identifier Fields",
            f.split(",").mkString("[", ", ", "]"), null))
          case None => Nil
        }) ++
        (if (props.isEmpty) Nil
         else Seq(Row("Table Properties",
           props.toSeq.sorted
             .map { case (k, v) => s"$k=$v" }.mkString("[", ",", "]"),
           null)))
    }
  }
}

/** `DESCRIBE [EXTENDED] <t> <col>` — Spark's column-describe shape
  * (info_name, info_value rows): name/type always; EXTENDED adds the
  * column statistics `ANALYZE TABLE … FOR COLUMNS` persisted (min,
  * max, num_nulls, distinct_count, avg_col_len), NULL where not
  * collected — exactly the native command's contract over a metastore
  * table. */
case class GraftDescribeColumnCommand(ns: String, name: String,
                                      column: String, extended: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("info_name", StringType, nullable = false)(),
    AttributeReference("info_value", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val df = store.snapshotPath(ns, name)
      .map(p => graft.pipeline.Snapshot.read(spark, p))
      .getOrElse(store.table(ns, name))
    val real = df.columns.find(_.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"DESCRIBE: no such column $column in $ns.$name " +
          s"(columns: ${df.columns.mkString(", ")})"))
    val base = Seq(
      Row("col_name", real),
      Row("data_type", df.schema(real).dataType.simpleString),
      Row("comment", df.schema(real).getComment().orNull))
    if (!extended) base
    else {
      val p = s"${GraftStats.ColPrefix}$real."
      val props = store.properties(ns, name)
      def g(s0: String) = props.get(p + s0).orNull
      base ++ Seq(
        Row("min", g("min")),
        Row("max", g("max")),
        Row("num_nulls", g("nulls")),
        Row("distinct_count", Option(g("ndv"))
          .map(v => math.round(v.toDouble).toString).orNull),
        Row("avg_col_len", g("avgLen")))
    }
  }
}

case class GraftShowSchemasCommand(pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("namespace", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val all = new TableStore(spark).listNamespaces()
    pattern.fold(all)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(all, p))
      .map(Row(_))
  }
}

/** SHOW TABLES [IN/FROM ns]. `ns = None` lists the whole graft catalog
  * (`SHOW TABLES FROM iceberg`). A 1-part namespace with no catalog
  * prefix (`SHOW TABLES IN silver`) is routed here ONLY when the
  * parser saw an existing graft namespace — other bare namespaces keep
  * Spark's native ShowTables plan. The session-catalog fallback below
  * remains for directly constructed commands. */
case class GraftShowTablesCommand(ns: Option[String], bare: Boolean,
                                  pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("table_name", StringType, nullable = false)(),
    AttributeReference("is_view", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val graftNs = ns.forall(n =>
      store.listNamespaces().contains(n.toLowerCase(java.util.Locale.ROOT)))
    def keep(t: String): Boolean = pattern.forall(p =>
      org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(Seq(t), p).nonEmpty)
    if (graftNs || !bare)
      store.tableRows(ns.getOrElse(""))
        .collect { case (n, t, v) if keep(t) => Row(n, t, v) }
    else // bare non-graft namespace: Spark's own database listing
      spark.sessionState.catalog
        .listTables(ns.get)
        .collect { case ti if keep(ti.table) =>
          Row(ti.database.getOrElse(""), ti.table, false) }
  }
}

/** SHOW VIEWS [IN ns] — the view subset of the graft listing, in
  * Spark's native output shape (namespace, viewName, isTemporary;
  * graft views are catalog views, so isTemporary = false). */
case class GraftShowViewsCommand(ns: Option[String],
                                 pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    def keep(t: String): Boolean = pattern.forall(p =>
      org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(Seq(t), p).nonEmpty)
    new TableStore(spark).tableRows(ns.getOrElse(""))
      .collect { case (n, t, true) if keep(t) => Row(n, t, false) }
  }
}

/** SHOW CREATE TABLE — reconstruct the CREATE statement from the
  * current schema (post-evolution), with TBLPROPERTIES when set.
  * Views render their stored query via CREATE VIEW. */
case class GraftShowCreateTableCommand(ns: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val stmt = if (store.isView(ns, name)) {
      s"CREATE VIEW iceberg.$ns.$name AS <stored query>"
    } else {
      val df = store.snapshotPath(ns, name)
        .map(p => graft.pipeline.Snapshot.read(spark, p))
        .getOrElse(store.table(ns, name))
      val cols = df.schema.fields
        .map(f => s"  ${f.name} ${f.dataType.sql}")
        .mkString(",\n")
      val props = store.properties(ns, name)
      val propsClause =
        if (props.isEmpty) ""
        else props.toSeq.sorted
          .map { case (k, v) => s"'$k' = '$v'" }
          .mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")")
      // the partition spec round-trips (Iceberg's SHOW CREATE carries
      // PARTITIONED BY, transforms included)
      val specClause = store.snapshotPath(ns, name)
        .map(graft.pipeline.Snapshot.partitionSpec)
        .filter(_.nonEmpty)
        .map(_.mkString("\nPARTITIONED BY (", ", ", ")"))
        .getOrElse("")
      s"CREATE TABLE iceberg.$ns.$name (\n$cols)\nUSING iceberg" +
        specClause + propsClause
    }
    Seq(Row(stmt))
  }
}

/** ALTER TABLE … RENAME TO — catalog-only rename of a registered or
  * snapshot-backed table (no data movement, like Iceberg's rename). */
case class GraftRenameTableCommand(ns: String, name: String,
                                   toNs: String, toName: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).renameTable(ns, name, toNs, toName)
    Seq.empty
  }
}

/** ALTER TABLE … SET TBLPROPERTIES — merge semantics, like Iceberg
  * (existing keys overwritten, others kept). */
case class GraftSetTblPropertiesCommand(ns: String, name: String,
                                        props: Map[String, String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).setProperties(ns, name, props)
    Seq.empty
  }
}

/** ALTER TABLE … UNSET TBLPROPERTIES [IF EXISTS] — a missing key
  * raises unless IF EXISTS (Spark's contract for v1 tables). */
case class GraftUnsetTblPropertiesCommand(ns: String, name: String,
                                          keys: Seq[String],
                                          ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).unsetProperties(ns, name, keys, ifExists)
    Seq.empty
  }
}

/** `ALTER TABLE … ADD CONSTRAINT <name> CHECK (<expr>)` — Delta Lake's
  * constraint grammar, stored the way Delta stores it (a
  * `graft.constraints.<name>` table property) and VALIDATED against
  * the existing rows first: like Delta, the ALTER fails if current
  * data already violates the constraint (otherwise the very next
  * write would be unexplainably blocked). */
case class GraftAddConstraintCommand(ns: String, name: String,
                                     constraint: String, expr: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val key = s"graft.constraints.$constraint"
    if (store.properties(ns, name).contains(key))
      throw new IllegalArgumentException(
        s"constraint $constraint already exists on $ns.$name")
    // validate existing data BEFORE registering (Delta's contract),
    // through the SAME violation predicate the DML gate evaluates —
    // AND the same registry-first resolution order GraftDml.commit
    // uses, so the rows validated here are exactly the rows the gate
    // will later protect (a name carrying both a registry entry and a
    // snapshot path resolves to the registry on both sides)
    val current = TableStore.registry(spark).get(Seq(ns, name))
      .orElse(store.snapshotPath(ns, name)
        .map(p => GraftDml.snapshotRead(spark, p)))
      .getOrElse(store.table(ns, name))
    val bad =
      try current.filter(GraftDml.constraintViolation(expr)).count()
      catch {
        case ex: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"ADD CONSTRAINT $constraint: expression '$expr' does " +
              s"not resolve against $ns.$name: ${ex.getMessage}", ex)
      }
    if (bad > 0) throw new IllegalStateException(
      s"cannot ADD CONSTRAINT $constraint ($expr): $bad existing " +
        s"row(s) of $ns.$name violate it")
    store.setProperties(ns, name, Map(key -> expr))
    Seq.empty
  }
}

/** `ALTER TABLE … DROP CONSTRAINT [IF EXISTS] <name>` — a missing
  * constraint raises in CONSTRAINT vocabulary (not the internal
  * property key or the UNSET TBLPROPERTIES remedial hint). */
case class GraftDropConstraintCommand(ns: String, name: String,
                                      constraint: String,
                                      ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val key = s"graft.constraints.$constraint"
    if (!store.properties(ns, name).contains(key)) {
      if (!ifExists) throw new java.util.NoSuchElementException(
        s"no such constraint: $constraint on $ns.$name " +
          "(DROP CONSTRAINT IF EXISTS to ignore)")
    } else store.unsetProperties(ns, name, Seq(key), ifExists = false)
    Seq.empty
  }
}

/** SHOW TBLPROPERTIES t [('key')] — all properties key-sorted, or the
  * one requested key (Spark's native output shapes: (key, value) rows,
  * or a single (value) row; an unknown requested key reports Spark's
  * "does not have property" placeholder value rather than raising). */
case class GraftShowTblPropertiesCommand(ns: String, name: String,
                                         propertyKey: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    (if (propertyKey.isEmpty)
       Seq(AttributeReference("key", StringType, nullable = false)())
     else Nil) :+
      AttributeReference("value", StringType, nullable = false)()

  override def run(spark: SparkSession): Seq[Row] = {
    val props = new TableStore(spark).properties(ns, name)
    propertyKey match {
      case Some(k) => Seq(Row(props.getOrElse(k,
        s"Table $ns.$name does not have property: $k")))
      case None => props.toSeq.sortBy(_._1)
        .map { case (k, v) => Row(k, v) }
    }
  }
}

/** `ALTER TABLE … SET IDENTIFIER FIELDS a, b` / `DROP IDENTIFIER
  * FIELDS a, b` — Iceberg's row-identity metadata, stored ONCE on the
  * table (the `graft.identifier-fields` property, persisted with the
  * catalog) instead of re-spelled per call: `create_changelog_view`
  * defaults its `identifier_columns` from it. SET replaces the whole
  * list (Iceberg's semantics); DROP removes the named fields and
  * clears the property when none remain. Fields must exist in the
  * current schema, resolved case-insensitively and stored in the
  * schema's casing. */
case class GraftIdentifierFieldsCommand(ns: String, name: String,
                                        fields: Seq[String],
                                        drop: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val df = store.snapshotPath(ns, name)
      .map(p => graft.pipeline.Snapshot.read(spark, p))
      .getOrElse(store.table(ns, name))
    val cur = store.properties(ns, name)
      .get(GraftIdentifierFieldsCommand.Key)
      .map(_.split(",").toSeq).getOrElse(Seq.empty)
    val next =
      if (drop) {
        val missing = fields.filterNot(f =>
          cur.exists(_.equalsIgnoreCase(f)))
        if (missing.nonEmpty) throw new java.util.NoSuchElementException(
          s"cannot DROP IDENTIFIER FIELDS ${missing.mkString(", ")}: " +
            s"not identifier fields of $ns.$name " +
            s"(current: ${cur.mkString(", ")})")
        cur.filterNot(c => fields.exists(_.equalsIgnoreCase(c)))
      } else fields.map(f => df.columns.find(_.equalsIgnoreCase(f))
        .getOrElse(throw new IllegalArgumentException(
          s"cannot SET IDENTIFIER FIELDS: no such column $f on " +
            s"$ns.$name (columns: ${df.columns.mkString(", ")})")))
    if (next.isEmpty)
      store.unsetProperties(ns, name,
        Seq(GraftIdentifierFieldsCommand.Key), ifExists = true)
    else store.setProperties(ns, name,
      Map(GraftIdentifierFieldsCommand.Key -> next.mkString(",")))
    Seq.empty
  }
}

object GraftIdentifierFieldsCommand {
  val Key = "graft.identifier-fields"

  /** The identifier fields set on `ns.name`, if any. */
  def fieldsOf(spark: SparkSession, ns: String,
               name: String): Seq[String] =
    (try new TableStore(spark).properties(ns, name)
     catch { case _: NoSuchElementException => Map.empty[String, String] })
      .get(Key).map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)
}

/** `ALTER TABLE … ADD PARTITION FIELD <col>` — Iceberg's partition-spec
  * evolution (identity transform), parsed by the text-level fallback in
  * [[GraftSqlParser]] (Spark's grammar has no PARTITION FIELD form).
  * METADATA-ONLY: the sidecar spec beside the snapshot dir gains the
  * field, nothing is rewritten, the live snapshot keeps its layout;
  * the next spec-aware commit writes the evolved layout while every
  * retained version keeps the layout it was written with. The column
  * must exist in the live schema (same check Iceberg's UpdateSpec
  * does against the table schema). */
case class GraftAddPartitionFieldCommand(ns: String, name: String,
                                         field: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name,
      "partition-spec evolution")
    val sf = graft.pipeline.Snapshot.parseSpecField(field)
    val schema = spark.read.parquet(path).schema
    // every SOURCE column of the transform must exist; the canonical
    // entry stores the schema's casing (DROP resolves the same way)
    val resolvedAll = sf.sources.map { src =>
      src -> schema.fieldNames.find(_.equalsIgnoreCase(src))
        .getOrElse(throw new IllegalArgumentException(
          s"cannot ADD PARTITION FIELD $field: no such column on " +
            s"$ns.$name (columns: ${schema.fieldNames.mkString(", ")})"))
    }
    val resolved = resolvedAll.head._2
    // time transforms need a temporal source — reject a days(int)
    // spec now, not at the first spec-aware commit
    val temporal = Set("days", "months", "years", "hours")
    if (temporal.exists(t => sf.raw.startsWith(t + "(")) &&
        !(schema(resolved).dataType
            .isInstanceOf[org.apache.spark.sql.types.DateType] ||
          schema(resolved).dataType
            .isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
          schema(resolved).dataType.isInstanceOf[
            org.apache.spark.sql.types.TimestampNTZType]))
      throw new IllegalArgumentException(
        s"cannot ADD PARTITION FIELD $field: time transforms need a " +
          s"date/timestamp column, $resolved is " +
          schema(resolved).dataType.simpleString)
    graft.pipeline.Snapshot.addPartitionField(path,
      resolvedAll.foldLeft(sf.raw) { case (raw, (src, res)) =>
        // WORD-BOUNDED case canonicalization: a bare .replace would
        // also rewrite the source's letters inside the transform
        // keyword or a sibling column name
        raw.replaceAll(
          "(?i)\\b" + java.util.regex.Pattern.quote(src) + "\\b",
          java.util.regex.Matcher.quoteReplacement(res)) })
    Seq.empty
  }
}

/** `ALTER TABLE … DROP PARTITION FIELD <col>` — the inverse evolution,
  * same metadata-only contract. */
case class GraftDropPartitionFieldCommand(ns: String, name: String,
                                          field: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name,
      "partition-spec evolution")
    // ADD resolves case-insensitively and stores the schema's casing;
    // DROP must match the same way, or `ADD … SUB` followed by
    // `DROP … SUB` (stored as 'sub') would throw. Transforms match on
    // their canonical FIELD name (bucket(4,C) and bucket(8,c) both
    // name c_bucket — Iceberg's one-bucket-per-column rule falls out
    // of the name collision).
    val target = graft.pipeline.Snapshot.parseSpecField(field).name
    val spec = graft.pipeline.Snapshot.partitionSpec(path)
    val resolved = spec.find(e => graft.pipeline.Snapshot
      .parseSpecField(e).name.equalsIgnoreCase(target))
      .getOrElse(field)
    graft.pipeline.Snapshot.dropPartitionField(path, resolved)
    Seq.empty
  }
}

/** `ALTER TABLE … CREATE/REPLACE TAG name [AS OF VERSION v]` —
  * Iceberg's ref-management grammar (an extension Spark cannot parse;
  * claimed at text level like PARTITION FIELD). The DDL twin of
  * `CALL system.create_tag`: tags a RETAINED version (default live),
  * protecting it from expiry and making it readable via
  * `VERSION AS OF '<tag>'`. */
case class GraftCreateTagDdlCommand(ns: String, name: String,
                                    tag: String, asOfVersion: Option[Long],
                                    replace: Boolean, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name, "ref DDL")
    if (ifNotExists &&
        graft.pipeline.Snapshot.tags(path).contains(tag)) return Seq.empty
    // Iceberg's REPLACE TAG re-points an EXISTING ref — a typo'd name
    // must raise, not silently create a stray tag
    if (replace && !graft.pipeline.Snapshot.tags(path).contains(tag))
      throw new java.util.NoSuchElementException(
        s"REPLACE TAG: no such tag '$tag' on $ns.$name (tags: " +
          graft.pipeline.Snapshot.tags(path).keys.toSeq.sorted
            .mkString(", ") + ")")
    val version = asOfVersion
      .orElse(graft.pipeline.Snapshot.currentVersion(path))
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TAG: no live version to tag at $ns.$name"))
    graft.pipeline.Snapshot.createTag(path, tag, version, replace)
    Seq.empty
  }
}

/** `ALTER TABLE … CREATE BRANCH name` — stage a branch forked at the
  * LIVE state (the WAP starting point; the DDL twin of
  * `Snapshot.createBranch`). */
case class GraftCreateBranchDdlCommand(ns: String, name: String,
                                       branch: String,
                                       ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name, "ref DDL")
    if (ifNotExists &&
        graft.pipeline.Snapshot.branches(path).contains(branch))
      return Seq.empty
    graft.pipeline.Snapshot.createBranch(spark, path, branch)
    Seq.empty
  }
}

/** `ALTER TABLE … DROP TAG/BRANCH [IF EXISTS] name`. */
case class GraftDropRefDdlCommand(ns: String, name: String,
                                  ref: String, isTag: Boolean,
                                  ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name, "ref DDL")
    try {
      if (isTag) graft.pipeline.Snapshot.dropTag(path, ref)
      else graft.pipeline.Snapshot.dropBranch(path, ref)
    } catch {
      case _: java.util.NoSuchElementException if ifExists => ()
    }
    Seq.empty
  }
}

/** `ALTER TABLE … WRITE ORDERED BY c1 [ASC|DESC], …` / `WRITE
  * UNORDERED` — Iceberg's table write-order metadata: METADATA-ONLY
  * (sidecar sort-order file); every later spec-aware commit writes
  * range-clustered, locally sorted files, the layout
  * `rewrite_data_files(strategy => 'sort')` produces on demand. The
  * named columns must exist in the live schema. */
case class GraftWriteOrderedByCommand(ns: String, name: String,
                                      order: Seq[(String, Boolean)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftDdl.snapshotPathFor(spark, ns, name,
      "WRITE ORDERED BY")
    if (order.nonEmpty) {
      val cols = spark.read.parquet(path).schema.fieldNames
      order.foreach { case (c, _) =>
        if (!cols.exists(_.equalsIgnoreCase(c)))
          throw new IllegalArgumentException(
            s"WRITE ORDERED BY: no such column $c on $ns.$name " +
              s"(columns: ${cols.mkString(", ")})")
      }
    }
    graft.pipeline.Snapshot.setSortOrder(path, order)
    Seq.empty
  }
}

private[catalog] object GraftDdl {
  /** Resolve a snapshot-backed table's dir, raising the same clear
    * category error every layout-touching command uses. */
  def snapshotPathFor(spark: SparkSession, ns: String, name: String,
                      what: String): String =
    new TableStore(spark).snapshotPath(ns, name).getOrElse(
      throw new UnsupportedOperationException(
        s"$what requires a snapshot-backed table: $ns.$name"))
}

/** SHOW PARTITIONS t [PARTITION (k=v, …)] — the partition fragments of
  * the live snapshot (Hive-style `k=v[/k=v]` strings, the same values
  * the `ns.t.partitions` metadata table rolls up), optionally filtered
  * by a partial spec. A non-partitioned table raises, matching Spark.
  * Driver-side listing bounded by the partition count (thousands, not
  * rows) — the data files are never read. */
case class GraftShowPartitionsCommand(ns: String, name: String,
                                      spec: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val path = store.snapshotPath(ns, name).getOrElse(
      throw new UnsupportedOperationException(
        s"SHOW PARTITIONS requires a snapshot-backed table: $ns.$name"))
    // walk the live snapshot dir for k=v subdirectory chains — the
    // layout createOrReplacePartitioned writes
    def fragments(dir: java.nio.file.Path,
                  prefix: Seq[String]): Seq[Seq[String]] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(dir)
      val subs = try s.iterator().asScala
        .filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(n => n.contains('=') && !n.startsWith("."))
        .toSeq.sorted
      finally s.close()
      if (subs.isEmpty) { if (prefix.isEmpty) Nil else Seq(prefix) }
      else subs.flatMap(n => fragments(dir.resolve(n), prefix :+ n))
    }
    val parts = fragments(java.nio.file.Paths.get(path), Nil)
    if (parts.isEmpty)
      throw new UnsupportedOperationException(
        s"SHOW PARTITIONS is not allowed on a table that is not " +
          s"partitioned: $ns.$name")
    parts
      .filter(p => spec.forall { case (k, v) => p.contains(s"$k=$v") })
      .map(p => Row(p.mkString("/")))
  }
}
