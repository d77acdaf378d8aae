package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Org/user/role capability model ([ref:core/account/capabilities.pl]
  * — the reference's `_system` database of organizations, users,
  * roles and scoped capability grants), single-node spelling.
  *
  * Shape mirrors the reference: an **organization** owns databases; a
  * **role** is a named set of actions (`instance_read_access`,
  * `create_database`, …); a **user** holds capabilities, each a
  * `(role, scope)` pair where scope is one database (`db/<name>`),
  * every database of an org (`org/<name>`), or everything (`*`).
  *
  * Enforcement is DRIVER-SIDE ONLY — [[Catalog.allows]] is a pure
  * in-memory lookup, never a Spark job: an auth check on every HTTP
  * request must not schedule cluster work. The catalog doubles as a
  * small graph ([[Catalog.toTriples]], graph `system`) so the usual
  * WOQL/GraphQL machinery can introspect grants like any other data —
  * the reference queries its `_system` db the same way. */
object Capabilities {

  object Actions {
    val InstanceRead  = "instance_read_access"
    val InstanceWrite = "instance_write_access"
    val SchemaRead    = "schema_read_access"
    val SchemaWrite   = "schema_write_access"
    val CreateDb      = "create_database"
    val DeleteDb      = "delete_database"
    val Branch        = "branch"
    val Transfer      = "transfer" // pack/clone/push/pull/fetch
    val Manage        = "manage_capabilities"
    val all: Set[String] = Set(InstanceRead, InstanceWrite, SchemaRead,
      SchemaWrite, CreateDb, DeleteDb, Branch, Transfer, Manage)
  }

  final case class Org(name: String, dbs: Set[String])
  final case class Role(name: String, actions: Set[String]) {
    require(actions.subsetOf(Actions.all),
      s"unknown actions in role $name: ${actions -- Actions.all}")
  }
  /** scope: `db/<name>`, `org/<name>`, or `*`. */
  final case class Capability(role: String, scope: String)
  final case class User(name: String, token: String,
                        capabilities: Seq[Capability])

  /** The admin role of the reference's bootstrap: every action. */
  val AdminRole: Role = Role("admin", Actions.all)
  val ReaderRole: Role = Role("reader",
    Set(Actions.InstanceRead, Actions.SchemaRead))
  val WriterRole: Role = Role("writer",
    Set(Actions.InstanceRead, Actions.InstanceWrite, Actions.SchemaRead,
      Actions.Branch))

  /** Catalog from JSON — the deployable spelling (env `GRAFT_CAPS_FILE`
    * points the server at it):
    * {{{
    * {"orgs":  [{"name":"acme","dbs":["dbA","dbB"]}],
    *  "roles": [{"name":"reader","actions":["instance_read_access"]}],
    *  "users": [{"name":"alice","token":"tok-alice",
    *             "capabilities":[{"role":"reader","scope":"db/_default"}]}]}
    * }}}
    * The built-in admin/reader/writer roles are always available and
    * need not be declared. */
  def fromJson(json: String): Catalog = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def str(j: JValue, f: String): String = (j \ f) match {
      case JString(x) => x
      case other => throw new IllegalArgumentException(
        s"capability catalog: field '$f' must be a string, got $other")
    }
    def arr(j: JValue, f: String): Seq[JValue] = (j \ f) match {
      case JArray(xs) => xs
      case JNothing => Nil
      case other => throw new IllegalArgumentException(
        s"capability catalog: field '$f' must be a list, got $other")
    }
    val j = JsonMethods.parse(json)
    val orgs = arr(j, "orgs").map(o =>
      Org(str(o, "name"), arr(o, "dbs").map {
        case JString(d) => d
        case other => throw new IllegalArgumentException(s"bad db $other")
      }.toSet))
    val roles = arr(j, "roles").map(r =>
      Role(str(r, "name"), arr(r, "actions").map {
        case JString(a) => a
        case other => throw new IllegalArgumentException(s"bad action $other")
      }.toSet))
    val builtins = Seq(AdminRole, ReaderRole, WriterRole)
      .filterNot(b => roles.exists(_.name == b.name))
    val users = arr(j, "users").map(u =>
      User(str(u, "name"), str(u, "token"),
        arr(u, "capabilities").map(c => Capability(str(c, "role"), str(c, "scope")))))
    Catalog(orgs, roles ++ builtins, users)
  }

  def fromFile(path: String): Catalog =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Catalog → the same JSON shape [[fromJson]] reads (round-trip
    * exact), so CRUD mutations over the management routes persist back
    * to the deployable `GRAFT_CAPS_FILE` spelling. Built-in roles are
    * written too — redundant on read, but the file then documents the
    * full effective policy. */
  def toJson(c: Catalog): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JObject(
      "orgs" -> JArray(c.orgs.toList.map(o => JObject(
        "name" -> JString(o.name),
        "dbs" -> JArray(o.dbs.toList.sorted.map(JString(_): JValue))))),
      "roles" -> JArray(c.roles.toList.map(r => JObject(
        "name" -> JString(r.name),
        "actions" -> JArray(r.actions.toList.sorted.map(JString(_): JValue))))),
      "users" -> JArray(c.users.toList.map(u => JObject(
        "name" -> JString(u.name), "token" -> JString(u.token),
        "capabilities" -> JArray(u.capabilities.toList.map(cap => JObject(
          "role" -> JString(cap.role),
          "scope" -> JString(cap.scope)): JValue))))))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  final case class Catalog(orgs: Seq[Org], roles: Seq[Role],
                           users: Seq[User]) {
    private val roleMap = roles.map(r => r.name -> r).toMap
    private val byToken = users.map(u => u.token -> u).toMap
    users.flatMap(_.capabilities).foreach(c => require(
      roleMap.contains(c.role), s"capability references unknown role ${c.role}"))

    def user(token: String): Option[User] = byToken.get(token)

    /** Is `action` on database `db` within any of the user's grants? */
    def allows(u: User, action: String, db: String): Boolean =
      u.capabilities.exists { c =>
        roleMap(c.role).actions(action) && (c.scope match {
          case "*" => true
          case s if s.startsWith("db/") => s.stripPrefix("db/") == db
          case s if s.startsWith("org/") =>
            orgs.exists(o => o.name == s.stripPrefix("org/") && o.dbs(db))
          case _ => false
        })
      }

    /** The catalog as a `system`-graph EAV frame (token hashes, not
      * tokens — credentials never enter queryable data). */
    def toTriples(spark: SparkSession): DataFrame = {
      import graft.storage.Eav
      def sha(s: String) = graft.storage.LayerStore.sha256Hex(s).take(16)
      val rows: Seq[(String, String, String)] =
        orgs.flatMap(o => ("sys:org/" + o.name, "rdf:type", "sys:Organization") +:
          o.dbs.toSeq.sorted.map(d => ("sys:org/" + o.name, "sys:database", d))) ++
        roles.flatMap(r => ("sys:role/" + r.name, "rdf:type", "sys:Role") +:
          r.actions.toSeq.sorted.map(a => ("sys:role/" + r.name, "sys:action", a))) ++
        users.flatMap { u =>
          Seq(("sys:user/" + u.name, "rdf:type", "sys:User"),
            ("sys:user/" + u.name, "sys:key_hash", sha(u.token))) ++
          u.capabilities.zipWithIndex.flatMap { case (c, i) =>
            val cap = s"sys:user/${u.name}/cap/$i"
            Seq(("sys:user/" + u.name, "sys:capability", cap),
              (cap, "sys:role", "sys:role/" + c.role),
              (cap, "sys:scope", c.scope))
          }
        }
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      rows.toDF("s", "p", "o")
        .select(lit("system").as("g"), col("s"), col("p"),
          lit("l").as("o_kind"), lit(null).cast(StringType).as("o_iri"),
          lit("xsd:string").as("o_typ"), col("o").as("o_str"),
          lit(null).cast(DoubleType).as("o_dbl"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(TimestampType).as("o_ts"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_lang"),
          lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
        .select(Eav.schema.fieldNames.map(col): _*)
    }
  }
}
